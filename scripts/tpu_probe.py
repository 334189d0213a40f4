"""Tiny TPU liveness probe: init backend, one 1024^2 matmul, sync.
Exit 0 = relay healthy. Run under a short timeout; a wedged relay hangs
in backend init and the timeout kill (during init, before any remote
compile) does not re-wedge it."""
import sys
import time

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

x = jnp.asarray(np.random.RandomState(0).rand(1024, 1024).astype(np.float32))
y = float((x @ x).sum())
print(f"probe ok in {time.time() - t0:.1f}s (sum={y:.3e})", flush=True)
sys.exit(0)
