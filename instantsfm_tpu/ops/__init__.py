from instantsfm_tpu.ops.gather import fast_gather, isolate  # noqa: F401
