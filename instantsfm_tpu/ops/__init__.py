from instantsfm_tpu.ops.gather import (fast_gather, gather_by_slot,  # noqa: F401
                                       isolate)
