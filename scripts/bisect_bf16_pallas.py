"""Bisect which op in conv3x3_reflect fails Mosaic compile under bf16.

Round-3 finding (v1 of this script): even a bare row-by-row DMA into a
column-offset slice of a (R+2, W+2, C) bf16 scratch fails to compile —
sublane offset 1 on a packed dtype. v2 tests the aligned design: DMA full
rows into an UNPADDED (R+2, W, C) scratch, build the reflect pad as a
register value with concatenate, slice taps with dynamic_slice.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 109, 256, 128
R = 16


def refl(r):
    return jnp.where(r < 0, -r, jnp.where(r >= H, 2 * H - 2 - r, r))


def run(name, kernel, dtype, extra_in=()):
    rng = np.random.RandomState(0)
    args = [jnp.asarray(rng.randn(1, H, W, C)).astype(dtype)]
    for s in extra_in:
        args.append(jnp.asarray(rng.randn(*s).astype(np.float32)).astype(dtype))
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra_in)
    try:
        f = pl.pallas_call(
            kernel,
            grid=(pl.cdiv(H, R),),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, R, W, C), lambda t: (0, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, pl.cdiv(H, R) * R, W, C), dtype),
            scratch_shapes=[pltpu.VMEM((R + 2, W, C), dtype),
                            pltpu.SemaphoreType.DMA],
        )
        y = jax.jit(f)(*args)
        jax.block_until_ready(y)
        print(f"{name}: OK")
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:200]}")
        return False


def load_rows(x_hbm, xbuf, sem, r0):
    def load_row(i, _):
        src = refl(r0 - 1 + i)
        cp = pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(src, 1)], xbuf.at[pl.ds(i, 1)], sem)
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(0, R + 2, load_row, 0)


def k_dma_aligned(x_hbm, y_ref, xbuf, sem):
    load_rows(x_hbm, xbuf, sem, pl.program_id(0) * R)
    y_ref[...] = xbuf[1:R + 1].reshape(1, R, W, C)


def k_pad_value(x_hbm, y_ref, xbuf, sem):
    load_rows(x_hbm, xbuf, sem, pl.program_id(0) * R)
    xv = xbuf[...]
    xp = jnp.concatenate([xv[:, 1:2], xv, xv[:, W - 2:W - 1]], axis=1)
    y_ref[...] = xp[1:R + 1, 1:W + 1].reshape(1, R, W, C)


def k_full(x_hbm, w_ref, y_ref, xbuf, sem):
    load_rows(x_hbm, xbuf, sem, pl.program_id(0) * R)
    xv = xbuf[...]
    xp = jnp.concatenate([xv[:, 1:2], xv, xv[:, W - 2:W - 1]], axis=1)
    acc = jnp.zeros((R * W, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xp[dy:dy + R, dx:dx + W]
            acc = acc + jax.lax.dot_general(
                tap.reshape(R * W, C), w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    y_ref[...] = acc.reshape(1, R, W, C).astype(y_ref.dtype)


def main():
    for dtype in (jnp.bfloat16, jnp.float32):
        print(f"--- {dtype.__name__} ---")
        run("dma_aligned", k_dma_aligned, dtype)
        run("pad_value", k_pad_value, dtype)
        run("full_conv", k_full, dtype, extra_in=[(3, 3, C, C)])


if __name__ == "__main__":
    main()
