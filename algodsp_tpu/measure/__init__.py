from algodsp_tpu.measure import thd, sweep, ir, loudness  # noqa: F401
