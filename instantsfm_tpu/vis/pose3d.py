"""Standalone sparse-model viewer (reference ``vis/pose3d.py``: viser browser
for COLMAP models).  viser-gated; headless fallback exports the same HTML view
as the demo."""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def serve(sparse_dir: str, point_size: float = 0.02):
    try:
        import viser
    except ImportError as e:
        raise ImportError("viser is required for the interactive viewer; "
                          "use --export_html for headless viewing") from e
    from instantsfm_tpu.io import colmap_model as cmio
    from instantsfm_tpu.math import lie
    import jax.numpy as jnp

    cams, imgs, pts = cmio.read_model(sparse_dir)
    server = viser.ViserServer()
    xyz = np.stack([p.xyz for p in pts.values()]) if pts else np.zeros((0, 3))
    rgb = np.stack([p.rgb for p in pts.values()]).astype(np.uint8) \
        if pts else np.zeros((0, 3), np.uint8)
    server.scene.add_point_cloud("/points", points=xyz.astype(np.float32),
                                 colors=rgb, point_size=point_size)
    for im in imgs.values():
        w, x, y, z = im.qvec_wxyz
        c = np.asarray(lie.camera_center(jnp.asarray([x, y, z, w]),
                                         jnp.asarray(im.tvec)))
        server.scene.add_camera_frustum(
            f"/cams/{im.id}", fov=1.0, aspect=4 / 3, scale=0.1,
            wxyz=np.array([w, x, y, z]), position=c)
    while True:
        time.sleep(1)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sparse_dir", required=True)
    parser.add_argument("--export_html", default=None)
    args = parser.parse_args(argv)
    if args.export_html:
        from instantsfm_tpu.cli.demo import write_html_view
        out = write_html_view(args.sparse_dir, args.export_html)
        print(f"view written to {out}")
        return 0
    serve(args.sparse_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
