"""DeDoDe detector-L + descriptor-B in JAX (weight-gated learned front-end).

Closes the reference's ``dedode`` front-end
(``controllers/feature_handler.py:43-151``: kornia ``KF.DeDoDe`` with
detector ``L-upright`` + descriptor ``B-upright``, n=4096 keypoints/image).
Architecture per Edstedt et al., "DeDoDe: Detect, Don't Describe — Describe,
Don't Detect" (3DV 2024): a VGG19 encoder tapped at strides 1/2/4/8 and a
coarse-to-fine decoder of ConvRefiner stacks that emits a keypoint logit map
(detector) or a dense descriptor field (descriptor), refined residually
across scales with an upsampled context stream.

Expressed TPU-first: NHWC convolutions (XLA tiles them onto the MXU),
``jax.image.resize`` bilinear upsampling (half-pixel centers, the
``align_corners=False`` convention), one jitted program per image shape.

The exact per-scale channel widths live in the CHECKPOINT, not in this file:
every structural dimension (encoder stage depths, refiner hidden widths,
grouped-conv factors, hidden-block counts, context widths) is inferred by
``convert_torch_checkpoint`` from the public ``.pth`` tensor shapes and
stored in the npz, and ``forward`` reads the same shapes back.  The
fixed assumptions — documented so a converter failure is diagnosable — are
the operator structure: [5x5 (grouped) conv -> (optional BN) -> ReLU -> 1x1
conv] blocks, residual hidden blocks, per-scale 1x1 out heads split as
[head | context], heads accumulated coarse-to-fine.  The converter raises
with a layer table when a checkpoint contradicts them.

Like SuperPoint/DISK, weights gate at ``INSTANTSFM_DEDODE_WEIGHTS`` (one npz
holding ``det_*`` and ``desc_*`` trees); without the file extraction raises
with conversion instructions and the architecture stays unit-tested via
``random_weights``.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_SCALES = (8, 4, 2, 1)

# kornia KF.DeDoDe normalizes [0,1] RGB with ImageNet statistics before the
# (ImageNet-pretrained) VGG19 encoder; real converted L/B checkpoints expect
# the same.  Applied in ``_extract_jit`` — the raw ``detector_logits``/
# ``descriptor_field`` entry points stay normalization-free so converter
# cross-check tests compare the bare operator structure.
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DeDoDeConfig(NamedTuple):
    max_keypoints: int = 4096    # reference n=4096 (feature_handler.py:63)
    nms_window: int = 3          # dedup adjacent logit maxima
    score_threshold: float = 0.0


# ------------------------------------------------------------------ forward

def _conv(x, w, b, groups=1):
    k = w.shape[0]
    p = k // 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return out + b[None, None, None, :]


def _bn(x, w, name):
    g, b = w.get(f"{name}_g"), w.get(f"{name}_b")
    if g is None:
        return x
    m, v = w[f"{name}_m"], w[f"{name}_v"]
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * g + b


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), [(0, 0)] * 4)


def _up2(x):
    n, h, wd, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * wd, c), "bilinear")


def _vgg_features(x, w, prefix):
    """VGG19-style encoder: stage s applies the ``{prefix}_enc{s}_{j}``
    3x3-conv(+BN)-ReLU layers; features are tapped before each 2x maxpool,
    yielding one map per decoder scale (strides 1, 2, 4, 8).  All structure
    (stage depths) lives in the KEY NAMES so nothing static is read from
    traced values."""
    feats = {}
    for stage, scale in enumerate((1, 2, 4, 8)):
        if stage > 0:
            x = _maxpool2(x)
        j = 0
        while f"{prefix}_enc{stage}_{j}_w" in w:
            name = f"{prefix}_enc{stage}_{j}"
            x = jax.nn.relu(_bn(_conv(x, w[f"{name}_w"], w[f"{name}_b"]),
                                w, f"{name}_bn"))
            j += 1
        feats[scale] = x
    return feats


def _refiner(x, w, p):
    """ConvRefiner: block0 maps in->hidden, ``n`` residual hidden blocks,
    1x1 out head.  Block = grouped 5x5 conv -> (BN) -> ReLU -> 1x1 conv.
    Grouped-conv factors come from shapes (groups = cin / weight_cin), which
    are static under jit."""
    j = 0
    h = None
    while f"{p}_b{j}_c1_w" in w:
        name = f"{p}_b{j}"
        src = x if j == 0 else h
        c1 = w[f"{name}_c1_w"]
        y = _conv(src, c1, w[f"{name}_c1_b"],
                  groups=src.shape[-1] // c1.shape[2])
        y = jax.nn.relu(_bn(y, w, f"{name}_c1_bn"))
        y = _conv(y, w[f"{name}_c2_w"], w[f"{name}_c2_b"])
        h = y if j == 0 else h + y
        j += 1
    return _conv(h, w[f"{p}_out_w"], w[f"{p}_out_b"])


def _decode(feats, w, prefix, head_dim):
    """Coarse-to-fine: at each scale the refiner consumes [encoder feature |
    upsampled context] and emits [head | context]; heads accumulate residually
    through bilinear 2x upsampling down to stride 1."""
    ctx = None
    acc = None
    for scale in _SCALES:
        f = feats[scale]
        x = f if ctx is None else jnp.concatenate([f, ctx], axis=-1)
        out = _refiner(x, w, f"{prefix}_ref{scale}")
        head, ctx = out[..., :head_dim], out[..., head_dim:]
        acc = head if acc is None else _up2(acc) + head
        ctx = _up2(ctx) if scale > 1 and ctx.shape[-1] else None
    return acc


def detector_logits(img, w):
    """img [H, W, 3] in [0,1] -> keypoint logit map [H, W]."""
    feats = _vgg_features(img[None], w, "det")
    return _decode(feats, w, "det", 1)[0, :, :, 0]


def descriptor_field(img, w):
    """img [H, W, 3] in [0,1] -> dense descriptor field [H, W, D].  The head
    width D is the stride-1 refiner's full out width (its context is empty),
    read from the weight SHAPE so it stays static under jit."""
    feats = _vgg_features(img[None], w, "desc")
    d = w["desc_ref1_out_w"].shape[-1]
    return _decode(feats, w, "desc", d)[0]


def _nms(heat, window: int):
    if window <= 1:
        return heat
    r = window // 2
    m = jax.lax.reduce_window(
        heat[None, :, :, None], -jnp.inf, jax.lax.max,
        (1, 2 * r + 1, 2 * r + 1, 1), (1, 1, 1, 1),
        [(0, 0), (r, r), (r, r), (0, 0)])[0, :, :, 0]
    return jnp.where(heat >= m, heat, -jnp.inf)


@partial(jax.jit, static_argnames=("cfg",))
def _extract_jit(img, w, cfg: DeDoDeConfig):
    img = (img - _IMAGENET_MEAN) / _IMAGENET_STD
    logits = detector_logits(img, w)
    H, W = logits.shape
    # the detector is trained as a distribution over positions: score via
    # per-image softmax, sample the top-n modes (NMS dedups plateaus)
    prob = jax.nn.softmax(logits.reshape(-1)).reshape(H, W)
    score, idx = jax.lax.top_k(_nms(prob, cfg.nms_window).reshape(-1),
                               cfg.max_keypoints)
    xy = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], -1)
    desc = descriptor_field(img, w).reshape(H * W, -1)[idx]
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True),
                              1e-8)
    valid = score > cfg.score_threshold
    return xy, score, desc, valid


def extract(img: np.ndarray, weights, cfg: DeDoDeConfig = None):
    """img: [H, W, 3] (or [H, W] grayscale, stacked) float in [0, 1].
    Returns (xy [K, 2], score [K], desc [K, D], valid [K]) numpy — the same
    contract as ``superpoint.extract`` / ``disk.extract``."""
    cfg = cfg or DeDoDeConfig()
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    h, w = img.shape[:2]
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
    xy, score, d, valid = _extract_jit(jnp.asarray(img, jnp.float32),
                                       weights, cfg)
    xy, score, d, valid = (np.asarray(xy), np.asarray(score),
                           np.asarray(d), np.array(valid))
    valid &= (xy[:, 0] < w) & (xy[:, 1] < h)    # drop pad-region detections
    return xy, score, d, valid


# ------------------------------------------------------------------ weights

def default_weights_path() -> str:
    return os.environ.get(
        "INSTANTSFM_DEDODE_WEIGHTS",
        os.path.join(os.path.expanduser("~"), ".cache", "instantsfm_tpu",
                     "dedode_L_B.npz"))


def load_weights(path: str) -> dict:
    z = np.load(path)
    out = {}
    for k in z.files:
        a = z[k]
        out[k] = int(a) if a.ndim == 0 else jnp.asarray(a)
    return out


def try_load_default():
    path = default_weights_path()
    return load_weights(path) if os.path.exists(path) else None


def random_weights(key, dtype=jnp.float32) -> dict:
    """Small architecture-shaped weights (tests / smoke only): encoder depth
    1 conv per stage with channels [8, 16, 24, 32], refiner hidden widths
    [32, 24, 16, 8], 1 hidden block, context width 4, descriptor dim 16."""
    enc_ch = [8, 16, 24, 32]
    hid = {8: 32, 4: 24, 2: 16, 1: 8}
    ctx_w = 4
    w = {}

    def mk(key, name, kh, cin, cout, groups=1):
        k1, key = jax.random.split(key)
        w[f"{name}_w"] = jax.random.normal(
            k1, (kh, kh, cin // groups, cout), dtype) \
            * (2.0 / (kh * kh * cin // groups)) ** 0.5
        w[f"{name}_b"] = jnp.zeros((cout,), dtype)
        return key

    for prefix, head in (("det", 1), ("desc", 16)):
        cin = 3
        for i, cout in enumerate(enc_ch):
            key = mk(key, f"{prefix}_enc{i}_0", 3, cin, cout)
            cin = cout
        ctx = 0
        for si, scale in enumerate(_SCALES):
            p = f"{prefix}_ref{scale}"
            rin = enc_ch[3 - si] + ctx
            for j in range(2):            # block0 + 1 hidden block
                c1_in = rin if j == 0 else hid[scale]
                key = mk(key, f"{p}_b{j}_c1", 5, c1_in, hid[scale])
                key = mk(key, f"{p}_b{j}_c2", 1, hid[scale], hid[scale])
            ctx = 0 if scale == 1 else ctx_w
            key = mk(key, f"{p}_out", 1, hid[scale], head + ctx)
    return w


def _walk_torch(sd):
    """State dict -> ordered (conv_w, conv_b, bn or None) triples plus the
    raw key list, classified by tensor shape and the universal
    ``running_mean``/``running_var`` BN key suffixes (position-robust: no
    module-name assumptions)."""
    items = [(k, v) for k, v in sd.items() if hasattr(v, "ndim")]
    convs = []
    i = 0
    while i < len(items):
        k, v = items[i]
        if v.ndim == 4 and k.endswith("weight"):
            base = k[:-len("weight")]
            b = sd.get(base + "bias")
            # BN group directly following this conv (if any)
            bn = None
            for k2, v2 in items[i + 1:i + 8]:
                if k2.endswith("running_mean"):
                    bb = k2[:-len("running_mean")]
                    bn = {"g": sd.get(bb + "weight"),
                          "b": sd.get(bb + "bias"),
                          "m": sd[bb + "running_mean"],
                          "v": sd[bb + "running_var"]}
                    break
                if v2.ndim == 4:
                    break
            convs.append((k, v, b, bn))
        i += 1
    return convs


def _convert_one(sd, prefix, out):
    """Map one DeDoDe network's state dict into ``out`` under ``prefix``."""
    convs = _walk_torch(sd)
    enc = [c for c in convs if c[1].shape[-1] == 3]      # 3x3 encoder convs
    ref = convs[len(enc):]
    if [c[1].shape[-1] for c in ref].count(3):
        raise ValueError(
            f"{prefix}: non-leading 3x3 convs; layer table: "
            f"{[(k, tuple(v.shape)) for k, v, _, _ in convs]}")
    # encoder stages split where the output width changes
    widths = [int(c[1].shape[0]) for c in enc]
    counts, stage_w = [], []
    for wd in widths:
        if stage_w and wd == stage_w[-1] and len(counts) <= len(stage_w):
            counts[-1] += 1
        elif len(stage_w) < 4 and (not stage_w or wd != stage_w[-1]):
            stage_w.append(wd)
            counts.append(1)
        else:
            counts[-1] += 1
    if len(counts) != 4:
        raise ValueError(f"{prefix}: expected 4 encoder stages, inferred "
                         f"{counts} from widths {widths}")
    # the width-change split cannot see a pool between equal-width stages
    # (VGG19 conv4/conv5 are both 512-wide); for real VGG19-width
    # checkpoints, cross-check against the known block depths rather than
    # silently misassembling the encoder
    if stage_w == [64, 128, 256, 512] and counts != [2, 2, 4, 4]:
        raise ValueError(
            f"{prefix}: VGG19-width encoder but stage depths {counts} != "
            f"[2, 2, 4, 4] — checkpoint likely contains convs past block 4 "
            f"(equal-width stages are indistinguishable by width); layer "
            f"table: {[(k, tuple(v.shape)) for k, v, _, _ in enc]}")

    def put(name, v, b, bn, cin_actual=None):
        wt = v.numpy().transpose(2, 3, 1, 0)             # OIHW -> HWIO
        out[f"{name}_w"] = wt
        out[f"{name}_b"] = (b.numpy() if b is not None
                            else np.zeros(v.shape[0], np.float32))
        if bn is not None:
            for s, t in (("g", "g"), ("b", "b"), ("m", "m"), ("v", "v")):
                out[f"{name}_bn_{s}"] = bn[t].numpy()
        if cin_actual is not None:
            out[f"{name}_g"] = np.asarray(cin_actual // v.shape[1])

    i = 0
    for stage, n in enumerate(counts):
        for j in range(n):
            k, v, b, bn = enc[i]
            put(f"{prefix}_enc{stage}_{j}", v, b, bn)
            i += 1

    # refiners: 4 scales x (hb+1 blocks of [5x5, 1x1]) + one 1x1 out head
    if len(ref) % 4 or (len(ref) // 4 - 1) % 2:
        raise ValueError(
            f"{prefix}: refiner conv count {len(ref)} does not factor as "
            f"4*(2*(hb+1)+1); layer table: "
            f"{[(k, tuple(v.shape)) for k, v, _, _ in ref]}")
    per = len(ref) // 4
    nb = (per - 1) // 2
    # head width: the final (stride-1) refiner's out IS the head; coarser
    # scales carry [head | context]
    head = int(ref[-1][1].shape[0]) if prefix == "desc" else 1
    # encoder tap width per scale (stage_w is stride 1,2,4,8 order)
    enc_w = {1: stage_w[0], 2: stage_w[1], 4: stage_w[2], 8: stage_w[3]}
    ctx = 0
    for si, scale in enumerate(_SCALES):
        p = f"{prefix}_ref{scale}"
        grp = ref[si * per:(si + 1) * per]
        rin = enc_w[scale] + ctx
        width = rin
        for j in range(nb):
            (k1, v1, b1, n1), (k2, v2, b2, n2) = grp[2 * j], grp[2 * j + 1]
            if v1.shape[-1] != 5 or v2.shape[-1] != 1:
                raise ValueError(
                    f"{prefix} ref{scale} block{j}: expected [5x5, 1x1], "
                    f"got {tuple(v1.shape)}, {tuple(v2.shape)}")
            if width % int(v1.shape[1]):
                raise ValueError(
                    f"{prefix} ref{scale} block{j}: input width {width} not "
                    f"divisible by weight cin/groups {int(v1.shape[1])}")
            put(f"{p}_b{j}_c1", v1, b1, n1, cin_actual=width)
            put(f"{p}_b{j}_c2", v2, b2, n2)
            width = int(v2.shape[0])                     # hidden width
        ko, vo, bo, no = grp[-1]
        put(f"{p}_out", vo, bo, no)
        o = int(vo.shape[0])
        if o < head:
            raise ValueError(f"{prefix} ref{scale}: out width {o} cannot "
                             f"carry the {head}-wide head")
        ctx = o - head if scale > 1 else 0
    if prefix == "desc":
        out["desc_head_dim"] = np.asarray(head)


def convert_torch_checkpoint(detector_pth: str, descriptor_pth: str,
                             out_path: str = None) -> str:
    """One-time converter: public DeDoDe checkpoints (official
    ``dedode_detector_L.pth`` + ``dedode_descriptor_B.pth``, also the
    kornia hub exports) -> one npz.  Classification is positional and
    shape-driven (see ``_walk_torch``); any structural contradiction with
    the documented operator assumptions raises with a layer table.  Run on
    any machine with torch; this repo only reads the npz."""
    import torch

    out = {}
    for prefix, path in (("det", detector_pth), ("desc", descriptor_pth)):
        sd = torch.load(path, map_location="cpu")
        for k in ("detector", "descriptor", "state_dict", "model"):
            if isinstance(sd, dict) and k in sd:
                sd = sd[k]
        _convert_one(sd, prefix, out)
    out_path = out_path or default_weights_path()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **out)
    return out_path
