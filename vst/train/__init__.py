"""vst.train — pure-function training steps under jit/pjit."""

from vst.train.faststyle import FastStyleConfig, FastStyleTrainer, ref_lr_schedule

__all__ = ["FastStyleConfig", "FastStyleTrainer", "ref_lr_schedule"]
