"""``ins-feat`` equivalent: images -> COLMAP database (reference ``scripts/feat.py``)."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--feature_name", default="sift_tpu")
    parser.add_argument("--max_image_size", type=int, default=1600)
    parser.add_argument("--max_keypoints", type=int, default=4096)
    parser.add_argument("--sequential_overlap", type=int, default=0,
                        help=">0 switches exhaustive matching to sequential")
    parser.add_argument("--match_ratio", type=float, default=None,
                        help="Lowe ratio (default 0.85 SIFT / 0.95 SuperPoint)")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)

    import jax

    from instantsfm_tpu import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from instantsfm_tpu.parallel import multihost
    if multihost.initialize():
        print(f"[distributed] process {multihost.process_index()}"
              f"/{multihost.process_count()}, "
              f"{len(jax.devices())} global devices")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from instantsfm_tpu.config import Config
    from instantsfm_tpu.features.handler import generate_database
    from instantsfm_tpu.pipeline.data_reader import read_data

    path_info = read_data(args.data_path)
    if path_info.database_exists:
        print(f"Database already exists at {path_info.database_path}; skipping "
              "(same behavior as the reference feat script)")
        return 0
    if not path_info.image_path:
        print(f"No images/ or color/ folder under {args.data_path}",
              file=sys.stderr)
        return 1

    config = Config("colmap")
    generate_database(path_info.image_path, path_info.database_path,
                      feature_name=args.feature_name, config=config,
                      max_image_size=args.max_image_size,
                      max_keypoints=args.max_keypoints,
                      match_ratio=args.match_ratio,
                      sequential_overlap=args.sequential_overlap)
    return 0


if __name__ == "__main__":
    sys.exit(main())
