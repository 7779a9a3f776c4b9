"""Image color-statistics transfer (offline tooling, host-side).

Algo-for-algo equivalent of ref codes/scripts/color_transfer.py: every
transfer the reference CLI exposes, with output parity gated against the
reference implementation in tests/test_color_transfer_parity.py.

Algorithms (`--algo`, comma-separable to chain):
  rgb / bgr   per-channel mean/std transfer in BGR  (ref :448 stats_transfer)
  lab         mean/std transfer in cv2 Lab          (ref :426 lab_transfer)
  ycbcr       mean/std in YCrCb, keep-Y + optional histogram pre-match
                                                    (ref :386 ycbcr_transfer)
  lum         transfer only luminance               (ref :355 luminance_transfer)
  hue         transfer only hue                     (ref :324 hue_transfer)
  pdf         Pitie iterative pdf transfer, fixed optimal rotations, n=300
                                                    (ref :705 PDFTransfer)
  sot         sliced optimal transport + bilateral regrain-lite
                                                    (ref :547 SOTransfer)
  histo       cumulative-histogram matching         (ref :492 histogram_matching)

Pre/post flags mirroring the reference CLI: `--rep` (replace channels
pre-pass, ref :267), `--histo` (post histogram match), `--regrain`
(ref :609 Regrain, the Pitie regrain.m solver). The reference's
`-blending` path is intentionally not ported: its own comment marks the
census-transform blend as experimental/broken ("Still produces the lines
in the images", ref :904).

Note: the reference's multi-algo loop dispatches on the unsplit string
(`algo ==` instead of `alg ==`, ref :1072-1096), so comma-chaining
silently repeats the first algorithm; this port dispatches each chained
algorithm as documented.

All images are BGR uint8 (cv2 convention), matching the reference's
IO exactly.

Usage:
  python scripts/color_transfer.py source.png target.png out.png \
      [--algo rgb|lab|ycbcr|lum|hue|pdf|sot|histo[,chain]] \
      [--rep] [--histo] [--regrain] [--no-keep-y] [--histo-match]
"""

from __future__ import annotations

import argparse

import cv2
import numpy as np


def _as_bgr(image):
    if isinstance(image, str):
        img = cv2.imread(image, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError(f"cannot read image: {image}")
        return img
    if isinstance(image, np.ndarray):
        return image
    raise ValueError("expected a path or np.ndarray")


def _match_size(source, target):
    """Resize source to target's size (ref :32 scale_img, INTER_AREA)."""
    if source.shape != target.shape:
        source = cv2.resize(source, (target.shape[1], target.shape[0]),
                            interpolation=cv2.INTER_AREA)
    return source


def _minmax_to_range(arr, lo=0, hi=255):
    """Min-max scale only when the array leaves [lo, hi] (ref :124)."""
    mn, mx = arr.min(), arr.max()
    if mn < lo or mx > hi:
        return (hi - lo) * (arr - mn) / (mx - mn) + lo
    return arr


def _bound(arr, clip=True, lo=0, hi=255):
    """ref :93 _scale_array: clip, or min-max scale when out of range."""
    return np.clip(arr, lo, hi) if clip else _minmax_to_range(arr, lo, hi)


def stats_transfer(source, target):
    """Per-channel mean/std transfer: out = (t - mu_t)/sigma_t * sigma_s
    + mu_s (ref :448). uint8 in/out, float64 math, truncating cast."""
    source = _as_bgr(source)
    target = _as_bgr(target)
    mu_t = np.mean(target, axis=(0, 1), keepdims=True)
    sd_t = np.std(target, axis=(0, 1), keepdims=True)
    mu_s = np.mean(source, axis=(0, 1), keepdims=True)
    sd_s = np.std(source, axis=(0, 1), keepdims=True)
    out = (target - mu_t) / sd_t * sd_s + mu_s
    return _bound(out).astype(np.uint8)


def lab_transfer(source, target):
    """mean/std transfer in cv2 Lab space (ref :426)."""
    lab_t = cv2.cvtColor(_as_bgr(target), cv2.COLOR_BGR2LAB)
    lab_s = cv2.cvtColor(_as_bgr(source), cv2.COLOR_BGR2LAB)
    return cv2.cvtColor(stats_transfer(lab_s, lab_t),
                        cv2.COLOR_LAB2BGR).astype(np.uint8)


def ycbcr_transfer(source, target, keep_y=True, histo_match=False):
    """mean/std transfer in YCrCb; keep_y preserves the target's luma,
    histo_match histogram-matches the source to the target first so only
    the color statistics move (ref :386)."""
    ycc_t = cv2.cvtColor(_as_bgr(target), cv2.COLOR_BGR2YCR_CB)
    ycc_s = cv2.cvtColor(_as_bgr(source), cv2.COLOR_BGR2YCR_CB)
    if histo_match:
        ycc_s = histogram_matching(reference=ycc_s, image=ycc_t)
    out = stats_transfer(ycc_s, ycc_t)
    if keep_y:
        out = np.concatenate([ycc_t[..., :1], out[..., 1:]], axis=-1)
    return cv2.cvtColor(out, cv2.COLOR_YCR_CB2BGR).astype(np.uint8)


def luminance_transfer(source, target):
    """Transfer only the luma channel's statistics (ref :355)."""
    ycc_t = cv2.cvtColor(_as_bgr(target), cv2.COLOR_BGR2YCR_CB)
    ycc_s = cv2.cvtColor(_as_bgr(source), cv2.COLOR_BGR2YCR_CB)
    out = stats_transfer(ycc_s, ycc_t)
    out = np.concatenate([out[..., :1], ycc_t[..., 1:]], axis=-1)
    return cv2.cvtColor(out, cv2.COLOR_YCR_CB2BGR).astype(np.uint8)


def hue_transfer(source, target):
    """Transfer only the hue channel's statistics (ref :324)."""
    hsv_t = cv2.cvtColor(_as_bgr(target), cv2.COLOR_BGR2HSV)
    hsv_s = cv2.cvtColor(_as_bgr(source), cv2.COLOR_BGR2HSV)
    out = stats_transfer(hsv_s, hsv_t)
    out = np.concatenate([out[..., :1], hsv_t[..., 1:]], axis=-1)
    return cv2.cvtColor(out, cv2.COLOR_HSV2BGR).astype(np.uint8)


def replace_channels(source, target, ycbcr=True, hsv=False,
                     transfersv=False):
    """Channel-replacement pre-pass (ref :267): swap the target's chroma
    (YCrCb) and/or hue (HSV) channels for the source's; with transfersv
    the S/V channels additionally get mean/std-transferred."""
    source = _as_bgr(source)
    target = _as_bgr(target)
    source = _match_size(source, target)
    if ycbcr:
        ycc_t = cv2.cvtColor(target, cv2.COLOR_BGR2YCR_CB)
        ycc_s = cv2.cvtColor(source, cv2.COLOR_BGR2YCR_CB)
        merged = np.concatenate([ycc_t[..., :1], ycc_s[..., 1:]], axis=-1)
        target = cv2.cvtColor(merged, cv2.COLOR_YCR_CB2BGR)
    if hsv:
        hsv_t = cv2.cvtColor(target, cv2.COLOR_BGR2HSV)
        hsv_s = cv2.cvtColor(source, cv2.COLOR_BGR2HSV)
        if transfersv:
            sv = stats_transfer(hsv_s, hsv_t)[..., 1:]
        else:
            sv = hsv_t[..., 1:]
        merged = np.concatenate([hsv_s[..., :1], sv], axis=-1)
        target = cv2.cvtColor(merged, cv2.COLOR_HSV2BGR)
    return target.astype(np.uint8)


def _match_cdf_1d(values, template):
    """Map `values` so its empirical CDF matches `template`'s (the
    skimage-style unique/cumsum/interp construction, ref :471)."""
    v_uniq, v_inv, v_counts = np.unique(values.ravel(),
                                        return_inverse=True,
                                        return_counts=True)
    t_uniq, t_counts = np.unique(template.ravel(), return_counts=True)
    v_quant = np.cumsum(v_counts) / values.size
    t_quant = np.cumsum(t_counts) / template.size
    return np.interp(v_quant, t_quant, t_uniq)[v_inv].reshape(values.shape)


def histogram_matching(reference, image, clip=None):
    """Per-channel cumulative-histogram matching of `image` to
    `reference` (ref :492). uint8 in/out (truncating cast)."""
    image = _as_bgr(image)
    reference = _as_bgr(reference)
    if image.ndim < 3:
        image = image[:, :, None]
    if reference.ndim < 3:
        reference = reference[:, :, None]
    if image.shape[-1] != reference.shape[-1]:
        raise ValueError("channel counts must match")
    matched = np.stack([_match_cdf_1d(image[..., c], reference[..., c])
                        for c in range(image.shape[-1])], axis=-1)
    if clip:
        matched = _bound(matched, clip=clip)
    return matched.astype(np.uint8)


def sot_transfer(source, target, steps=10, batch_size=5,
                 reg_sigma_xy=16.0, reg_sigma_v=5.0, clip=False):
    """Sliced optimal transport color transfer (ref :547): per step,
    average the 1D OT advection along `batch_size` random directions,
    then regularize the displacement field with a bilateral filter so
    the grain of the target survives. Draws directions from the global
    np.random state exactly like the reference (seed it for
    reproducibility)."""
    source = _as_bgr(source).astype(np.float32)
    target = _as_bgr(target).astype(np.float32)
    if source.ndim < 3:
        source = source[:, :, None]
    if target.ndim < 3:
        target = target[:, :, None]
    source = _match_size(source, target)
    h, w, c = target.shape
    moved = target.copy()
    flat_src = source.reshape(-1, c)
    for _ in range(steps):
        advect = np.zeros((h * w, c), dtype=np.float32)
        for _ in range(batch_size):
            direction = np.random.normal(size=c).astype(np.float32)
            direction /= np.linalg.norm(direction)
            proj_m = (moved.reshape(-1, c) * direction).sum(-1)
            proj_s = (flat_src * direction).sum(-1)
            id_m = np.argsort(proj_m)
            id_s = np.argsort(proj_s)
            shift = proj_s[id_s] - proj_m[id_m]
            advect[id_m] += shift[:, None] * direction[None, :]
        moved += advect.reshape(h, w, c) / batch_size
        moved = _bound(moved, clip=clip)
    if reg_sigma_xy != 0.0:
        diff = (moved - target).astype(np.float32)
        moved = target + cv2.bilateralFilter(diff, 0, reg_sigma_v,
                                             reg_sigma_xy)
    return moved.astype(np.uint8)


# --- Pitie regrain solver (ref :609 Regrain; regrain.m) -------------------

_REGRAIN_NBITS = [4, 16, 32, 64, 64, 64]


def _shift(arr, axis, direction):
    """Edge-replicated 1px shift: direction=+1 pulls the next pixel,
    -1 the previous (the first/last_pad helpers of ref :661-664)."""
    if direction > 0:
        head = np.take(arr, range(1, arr.shape[axis]), axis=axis)
        tail = np.take(arr, [-1], axis=axis)
    else:
        head = np.take(arr, [0], axis=axis)
        tail = np.take(arr, range(0, arr.shape[axis] - 1), axis=axis)
    return np.concatenate([head, tail], axis=axis)


def _regrain_solve(out, target, source, nbit, level, smoothness,
                   eps=1e-6):
    """One multigrid level of the regrain fixed-point iteration: psi
    weighs fidelity to the graded colors, phi to the target's gradient
    field (ref :654 solve)."""
    c = target.shape[2]
    dx = _shift(target, 1, +1) - _shift(target, 1, -1)
    dy = _shift(target, 0, +1) - _shift(target, 0, -1)
    delta = np.sqrt((dx ** 2 + dy ** 2).sum(axis=2, keepdims=True))
    psi = np.minimum(256.0 * delta / 5.0, 1.0)
    phi = 30.0 * 2.0 ** (-level) / (1.0 + 10.0 * delta / smoothness)
    phis = [(_shift(phi, 1, +1) + phi) / 2.0,
            (_shift(phi, 0, +1) + phi) / 2.0,
            (_shift(phi, 1, -1) + phi) / 2.0,
            (_shift(phi, 0, -1) + phi) / 2.0]
    shifts = [(1, +1), (0, +1), (1, -1), (0, -1)]
    rho = 1.0 / 5.0
    den = psi + phis[0] + phis[1] + phis[2] + phis[3] + eps
    for _ in range(nbit):
        num = psi * source
        for ph, (ax, d) in zip(phis, shifts):
            num = num + ph * (_shift(out, ax, d) - _shift(target, ax, d)
                              + target)
        out = num / den * (1.0 - rho) + rho * out
    return out


def _regrain_rec(out, target, source, nbits, level, smoothness):
    h2 = (target.shape[0] + 1) // 2
    w2 = (target.shape[1] + 1) // 2
    if len(nbits) > 1 and h2 > 20 and w2 > 20:
        small = [cv2.resize(a, (w2, h2), interpolation=cv2.INTER_LINEAR)
                 for a in (target, source, out)]
        out_small = _regrain_rec(small[2], small[0], small[1],
                                 nbits[1:], level + 1, smoothness)
        out = cv2.resize(out_small, (target.shape[1], target.shape[0]),
                         interpolation=cv2.INTER_LINEAR)
    return _regrain_solve(out, target, source, nbits[0], level,
                          smoothness)


def regrain(source, target, smoothness=1.0):
    """Regraining post-process: keep the target's gradient field, the
    source's colors (Pitie et al. 2007; ref :609). BGR uint8 in/out."""
    source = _as_bgr(source)
    target = _as_bgr(target)
    source = _match_size(source, target)
    t = target / 255.0
    s = source / 255.0
    out = _regrain_rec(t.copy(), t, s, _REGRAIN_NBITS, 0, smoothness)
    return (255.0 * _bound(out, lo=0, hi=1)).astype(np.uint8)


# --- Pitie iterative pdf transfer (ref :705 PDFTransfer) ------------------

# the fixed rotation set of Pitie et al. (2007) §("optimal rotations"),
# identical to ref :841 optimal_rotations
_OPTIMAL_ROTATIONS = np.array([
    [[1.000000, 0.000000, 0.000000], [0.000000, 1.000000, 0.000000],
     [0.000000, 0.000000, 1.000000]],
    [[0.333333, 0.666667, 0.666667], [0.666667, 0.333333, -0.666667],
     [-0.666667, 0.666667, -0.333333]],
    [[0.577350, 0.211297, 0.788682], [-0.577350, 0.788668, 0.211352],
     [0.577350, 0.577370, -0.577330]],
    [[0.577350, 0.408273, 0.707092], [-0.577350, -0.408224, 0.707121],
     [0.577350, -0.816497, 0.000029]],
    [[0.332572, 0.910758, 0.244778], [-0.910887, 0.242977, 0.333536],
     [-0.244295, 0.333890, -0.910405]],
    [[0.243799, 0.910726, 0.333376], [0.910699, -0.333174, 0.244177],
     [-0.333450, -0.244075, 0.910625]],
])


def _pdf_transfer_1d(arr_in, arr_ref, n=300, eps=1e-6):
    """Exact 1D pdf transfer on an n-bin shared lattice (ref :788)."""
    lo = min(arr_in.min(), arr_ref.min()) - eps
    hi = max(arr_in.max(), arr_ref.max()) + eps
    xs = lo + (hi - lo) * np.arange(n + 1) / n
    hist_in, _ = np.histogram(arr_in, xs)
    hist_ref, _ = np.histogram(arr_ref, xs)
    xs = xs[:-1]
    d_in = np.cumsum(hist_in) / hist_in.sum()
    d_ref = np.cumsum(hist_ref) / hist_ref.sum()
    t = np.interp(d_in, d_ref, xs)
    t[d_in <= d_ref[0]] = lo
    t[d_in >= d_ref[-1]] = hi
    return np.interp(arr_in, xs, t)


def pdf_transfer(source, target, n=300):
    """Pitie iterative distribution transfer with the fixed optimal
    rotation set (ref :729 pdf_tranfer). BGR uint8 in/out."""
    source = _as_bgr(source)
    target = _as_bgr(target)
    c = target.shape[2]
    arr_out = target.reshape(-1, c).T / 255.0
    arr_ref = source.reshape(-1, c).T / 255.0
    for rot in _OPTIMAL_ROTATIONS:
        rot_out = rot @ arr_out
        rot_ref = rot @ arr_ref
        moved = np.stack([_pdf_transfer_1d(rot_out[i], rot_ref[i], n)
                          for i in range(rot_out.shape[0])])
        arr_out = arr_out + rot.T @ (moved - rot_out)
    arr_out = _bound(arr_out, lo=0, hi=1)
    return (255.0 * arr_out).astype(np.uint8).T.reshape(target.shape)


_ALGOS = {
    "rgb": lambda s, t, a: stats_transfer(s, t),
    "bgr": lambda s, t, a: stats_transfer(s, t),
    "lab": lambda s, t, a: lab_transfer(s, t),
    "ycbcr": lambda s, t, a: ycbcr_transfer(
        s, t, keep_y=a.keep_y, histo_match=a.histo_match),
    "lum": lambda s, t, a: luminance_transfer(s, t),
    "hue": lambda s, t, a: hue_transfer(s, t),
    "pdf": lambda s, t, a: pdf_transfer(s, t),
    "sot": lambda s, t, a: sot_transfer(s, t, steps=10, clip=False),
    "histo": lambda s, t, a: histogram_matching(reference=s, image=t),
}


def color_transfer(src, tgt, algo="lab"):
    """Float [0,1] RGB convenience wrapper (in-framework callers).

    DIRECTION (round 4, aligned with the reference CLI): `src` is the
    REFERENCE image the colors come from, `tgt` is the image being
    recolored — the output is `tgt` carrying `src`'s color statistics.
    (Rounds 1-3 had the opposite direction; callers written against the
    old semantics must swap arguments.)"""
    s8 = np.clip(np.round(np.asarray(src)[..., ::-1] * 255), 0,
                 255).astype(np.uint8)
    t8 = np.clip(np.round(np.asarray(tgt)[..., ::-1] * 255), 0,
                 255).astype(np.uint8)
    ns = argparse.Namespace(keep_y=True, histo_match=False)
    if algo not in _ALGOS:
        raise ValueError(f"unknown algo {algo}")
    out = _ALGOS[algo](s8, t8, ns)
    return out[..., ::-1].astype(np.float32) / 255.0


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("source", help="reference image the colors come from")
    p.add_argument("target", help="input image to be recolored")
    p.add_argument("out", help="output path")
    p.add_argument("--algo", default="lab",
                   help="comma-separable chain of: "
                        + "|".join(sorted(_ALGOS)))
    p.add_argument("--rep", action="store_true",
                   help="channel-replacement pre-pass on the source")
    p.add_argument("--histo", action="store_true",
                   help="histogram-match post-pass")
    p.add_argument("--regrain", action="store_true",
                   help="regrain post-process")
    p.add_argument("--no-keep-y", dest="keep_y", action="store_false",
                   help="ycbcr: also transfer the luma channel")
    p.add_argument("--histo-match", action="store_true",
                   help="ycbcr: histogram pre-match the source")
    args = p.parse_args()

    src = _as_bgr(args.source)
    img = _as_bgr(args.target)
    if args.rep:
        src = replace_channels(source=src, target=img, ycbcr=True,
                               hsv=True, transfersv=True)
    for alg in args.algo.split(","):
        alg = alg.strip()
        if alg not in _ALGOS:
            raise SystemExit(f"unknown algo '{alg}' "
                             f"(choose from {sorted(_ALGOS)})")
        img = _ALGOS[alg](src, img, args)
    if args.histo:
        img = histogram_matching(reference=src, image=img)
    if args.regrain:
        img = regrain(source=img, target=args.target)
    cv2.imwrite(args.out, img)
    print(f"{args.algo} transfer -> {args.out}")


if __name__ == "__main__":
    main()
