"""Global mapper: the pipeline driver (reference ``controllers/global_mapper.py``).

Identical stage sequence and cadence:
preprocess -> view-graph calibration -> relative pose + inlier filters + LCC ->
2x (rotation averaging + rotation filter + LCC) -> track establishment ->
global positioning + angle filter + normalize ->
3x (BA + undistort + reproj filter with eps*max(1, 3-iter)) ->
final filters + normalize -> [retriangulation] -> [pruning].
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.config import Config
from instantsfm_tpu.pipeline import (ba, filters, positioning, preprocess,
                                     relpose, rotation_averaging,
                                     track_filters, tracks as tracks_mod, vgc)
from instantsfm_tpu.scene.types import Cameras, Images, Tracks, ViewGraph


class PipelineError(RuntimeError):
    pass


def solve_global_mapper(view_graph: ViewGraph, cameras: Cameras,
                        images: Images, config: Config,
                        depths_available: bool = False, visualizer=None,
                        dtype=jnp.float64, log=print, stage_hook=None):
    """Run the full global-SfM stage sequence.

    Set ``ISFM_PROFILE=<dir>`` to capture a ``jax.profiler`` trace of the
    whole run with one named ``TraceAnnotation`` span per stage (view it
    with tensorboard / xprof; SURVEY.md §5 tracing plan).

    ``stage_hook(name, cameras, images, tracks)``, if given, is called after
    each completed stage — the accuracy-ablation probes use it to measure
    per-stage pose error without touching pipeline state."""
    import os

    profile_dir = os.environ.get("ISFM_PROFILE")
    if profile_dir:
        import contextlib

        import jax

        with jax.profiler.trace(profile_dir):
            return _solve_impl(view_graph, cameras, images, config,
                               depths_available, visualizer, dtype, log,
                               annotate=jax.profiler.TraceAnnotation,
                               stage_hook=stage_hook)
    return _solve_impl(view_graph, cameras, images, config,
                       depths_available, visualizer, dtype, log,
                       stage_hook=stage_hook)


def _solve_impl(view_graph: ViewGraph, cameras: Cameras,
                images: Images, config: Config,
                depths_available: bool = False, visualizer=None,
                dtype=jnp.float64, log=print, annotate=None,
                stage_hook=None):
    opts = config.OPTIONS
    tracks = Tracks.empty()
    timings = {}
    _span = [None]   # open TraceAnnotation for the current stage

    def _stage(name):
        if _span[0] is not None:
            _span[0].__exit__(None, None, None)
            _span[0] = None
        if annotate is not None:
            _span[0] = annotate(f"stage:{name}")
            _span[0].__enter__()
        log("-------------------------------------")
        log(f"Running {name} ...")
        log("-------------------------------------")
        return time.time()

    def _viz(stage):
        if visualizer is not None:
            visualizer.add_step(cameras, images, tracks, stage)

    def _hook(name):
        if stage_hook is not None:
            stage_hook(name, cameras, images, tracks)

    if not opts["skip_preprocessing"]:
        t0 = _stage("preprocessing")
        preprocess.update_image_pairs_config(view_graph, cameras, images)
        n_pure = preprocess.decompose_relpose(view_graph, cameras, images)
        log(f"Decompose relative pose done. {n_pure} pairs are pure rotation.")
        timings["preprocessing"] = time.time() - t0

    if not opts["skip_view_graph_calibration"]:
        t0 = _stage("view graph calibration")
        vgc.solve_view_graph_calibration(
            view_graph, cameras, images, config.VIEW_GRAPH_CALIBRATOR_OPTIONS,
            dtype=dtype)
        timings["view_graph_calibration"] = time.time() - t0

    if not opts["skip_relative_pose_estimation"]:
        t0 = _stage("relative pose estimation")
        relpose.undistort_images(cameras, images, dtype)
        relpose.estimate_relative_pose(view_graph, cameras, images, dtype=dtype)
        n1 = filters.filter_inlier_num(
            view_graph, config.INLIER_THRESHOLD_OPTIONS["min_inlier_num"])
        n2 = filters.filter_inlier_ratio(
            view_graph, config.INLIER_THRESHOLD_OPTIONS["min_inlier_ratio"])
        log(f"Filtered {n1} pairs by inlier count, {n2} by inlier ratio")
        if not view_graph.keep_largest_connected_component(images):
            raise PipelineError("no connected component after relpose filtering")
        timings["relative_pose_estimation"] = time.time() - t0
        _hook("relpose")

    if not opts["skip_rotation_averaging"]:
        t0 = _stage("rotation averaging")
        for round_idx in range(2):
            ok = rotation_averaging.estimate_rotations(
                view_graph, images, config.ROTATION_ESTIMATOR_OPTIONS,
                config.L1_SOLVER_OPTIONS, dtype=dtype)
            if not ok:
                raise PipelineError("rotation averaging failed")
            filters.filter_rotations(
                view_graph, images,
                config.INLIER_THRESHOLD_OPTIONS["max_rotation_error"])
            if not view_graph.keep_largest_connected_component(images):
                raise PipelineError("failed to keep largest connected component")
        n_reg = int(images.registered.sum())
        log(f"{n_reg} / {images.num_images} images are within the connected component.")
        timings["rotation_averaging"] = time.time() - t0
        _hook("rotation_averaging")

    tracks_orig = Tracks.empty()
    if not opts["skip_track_establishment"]:
        t0 = _stage("track establishment")
        tracks, tracks_orig = tracks_mod.establish_tracks(
            view_graph, images, config.TRACK_ESTABLISHMENT_OPTIONS,
            return_full=True)
        log(f"Established {tracks.num_tracks} tracks "
            f"({tracks.num_observations} observations; "
            f"{tracks_orig.num_tracks} before filtering)")
        timings["track_establishment"] = time.time() - t0

    if not opts["skip_global_positioning"]:
        t0 = _stage("global positioning")
        relpose.undistort_images(cameras, images, dtype)
        tracks = positioning.global_positioning(
            cameras, images, tracks, config.GLOBAL_POSITIONER_OPTIONS,
            depths_available=depths_available, dtype=dtype,
            view_graph=view_graph)
        _viz("global_positioning")
        tracks = track_filters.filter_tracks_by_angle(
            cameras, images, tracks,
            config.INLIER_THRESHOLD_OPTIONS["max_angle_error"])
        track_filters.normalize_reconstruction(
            images, tracks, depths=depths_available or None)
        timings["global_positioning"] = time.time() - t0
        _hook("global_positioning")

    if not opts["skip_bundle_adjustment"]:
        t0 = _stage("bundle adjustment")
        n_rounds = opts["num_iteration_bundle_adjustment"]
        if visualizer is None:
            # device-resident rounds: observations ship once, inter-round
            # cheirality/min-view/reprojection filters run as device-side
            # valid-mask updates (PERF_NOTES r4: the classic loop paid ~25 s
            # of 8-9 MB/s tunnel transfer per round at 500 images)
            tracks = ba.bundle_adjustment_rounds(
                cameras, images, tracks, config.BUNDLE_ADJUSTER_OPTIONS,
                config.INLIER_THRESHOLD_OPTIONS["max_reprojection_error"],
                rounds=n_rounds, dtype=dtype)
        else:
            # classic per-round loop (per-round snapshots for the live view)
            for it in range(n_rounds):
                ba.bundle_adjustment(cameras, images, tracks,
                                     config.BUNDLE_ADJUSTER_OPTIONS,
                                     dtype=dtype)
                relpose.undistort_images(cameras, images, dtype)
                tracks = track_filters.filter_tracks_by_reprojection_normalized(
                    cameras, images, tracks,
                    config.INLIER_THRESHOLD_OPTIONS["max_reprojection_error"]
                    * max(1, 3 - it))
                _viz("bundle_adjustment")
        log(f"{int(images.registered.sum())} images are registered after BA.")

        relpose.undistort_images(cameras, images, dtype)
        tracks = track_filters.filter_tracks_by_reprojection_normalized(
            cameras, images, tracks,
            config.INLIER_THRESHOLD_OPTIONS["max_reprojection_error"])
        tracks = track_filters.filter_tracks_triangulation_angle(
            cameras, images, tracks,
            config.INLIER_THRESHOLD_OPTIONS["min_triangulation_angle"])
        track_filters.normalize_reconstruction(
            images, tracks, depths=depths_available or None)
        timings["bundle_adjustment"] = time.time() - t0
        _hook("bundle_adjustment")

    if not opts["skip_retriangulation"]:
        t0 = _stage("retriangulation")
        from instantsfm_tpu.pipeline import retriangulation
        tracks = retriangulation.retriangulate_tracks(
            cameras, images, tracks, tracks_orig, config.TRIANGULATOR_OPTIONS,
            config.BUNDLE_ADJUSTER_OPTIONS, dtype=dtype, log=log)
        ba.bundle_adjustment(cameras, images, tracks,
                             config.BUNDLE_ADJUSTER_OPTIONS, dtype=dtype)
        relpose.undistort_images(cameras, images, dtype)
        tracks = track_filters.filter_tracks_by_reprojection_normalized(
            cameras, images, tracks,
            config.INLIER_THRESHOLD_OPTIONS["max_reprojection_error"])
        tracks = track_filters.filter_tracks_triangulation_angle(
            cameras, images, tracks,
            config.INLIER_THRESHOLD_OPTIONS["min_triangulation_angle"])
        timings["retriangulation"] = time.time() - t0

    if not opts["skip_pruning"]:
        t0 = _stage("pruning")
        from instantsfm_tpu.pipeline import pruning
        pruning.prune_weakly_connected_images(images, tracks, log=log)
        timings["pruning"] = time.time() - t0

    if _span[0] is not None:
        _span[0].__exit__(None, None, None)
        _span[0] = None
    for name, dt in timings.items():
        log(f"{name} took: {dt:.2f}s")
    return cameras, images, tracks, timings
