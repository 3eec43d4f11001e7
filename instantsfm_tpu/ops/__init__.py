from instantsfm_tpu.ops.gather import (banded_gather,  # noqa: F401
                                       fast_gather, gather_by_slot, isolate)
