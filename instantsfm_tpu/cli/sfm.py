"""``ins-sfm`` equivalent: database -> global SfM -> COLMAP sparse model.

Reference ``scripts/sfm.py``.  Usage:
    python -m instantsfm_tpu.cli.sfm --data_path <dir> [--export_txt]
                                     [--platform tpu|cpu] [--f32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--export_txt", action="store_true")
    parser.add_argument("--disable_depths", action="store_true")
    parser.add_argument("--enable_gui", action="store_true",
                        help="serve a live viser view of the reconstruction")
    parser.add_argument("--record_recon", action="store_true",
                        help="record per-step reconstruction snapshots")
    parser.add_argument("--record_path", default=None)
    parser.add_argument("--platform", default=None,
                        help="jax platform override (e.g. cpu)")
    parser.add_argument("--f32", action="store_true",
                        help="solve in float32 (default on TPU)")
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
    backend = jax.default_backend()
    use_f64 = not args.f32 and backend == "cpu"
    if use_f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    dtype = jnp.float64 if use_f64 else jnp.float32

    from instantsfm_tpu.config import Config
    from instantsfm_tpu.io.colmap_db import read_colmap_database
    from instantsfm_tpu.pipeline.data_reader import (read_data,
                                                     read_depths_into_features)
    from instantsfm_tpu.pipeline.mapper import solve_global_mapper
    from instantsfm_tpu.pipeline.writer import write_reconstruction

    path_info = read_data(args.data_path)
    if not path_info.database_exists:
        print(f"No database.db found under {args.data_path}", file=sys.stderr)
        return 1

    view_graph, cameras, images, feature_name = read_colmap_database(
        path_info.database_path)
    print(f"Read {images.num_images} images, {view_graph.num_pairs} pairs "
          f"({feature_name} features); backend={backend} dtype={dtype.__name__}")

    depths_available = False
    if path_info.depth_path and not args.disable_depths:
        depths_available = read_depths_into_features(
            path_info.depth_path, cameras, images)

    visualizer = None
    if args.enable_gui or args.record_recon:
        from instantsfm_tpu.vis.visualizer import ReconstructionVisualizer
        visualizer = ReconstructionVisualizer(
            serve=args.enable_gui, save_data=args.record_recon,
            save_dir=args.record_path or path_info.record_path)

    config = Config(feature_name)
    t0 = time.time()
    cameras, images, tracks, timings = solve_global_mapper(
        view_graph, cameras, images, config,
        depths_available=depths_available, visualizer=visualizer, dtype=dtype)
    print(f"Reconstruction done in {time.time() - t0:.2f} seconds")

    write_reconstruction(path_info.output_path, cameras, images, tracks,
                         path_info.image_path, export_txt=args.export_txt)
    print(f"Reconstruction written to {path_info.output_path}")

    if args.enable_gui and visualizer is not None:
        visualizer.block()
    return 0


if __name__ == "__main__":
    sys.exit(main())
