"""vst.cli — command-line entry points (``python -m vst.cli <command>``)."""
