"""Pure-numpy executable oracles for the correctness suite.

These implement the *reference semantics* — the torchstain-equivalent math
that the upstream torch backend documents line-by-line
(``/root/reference/src/stainx/backends/torch_backend.py``) — as plain,
loopy, CPU numpy. They exist only as test baselines (SURVEY §4: "torch-free
CPU reference implementations ... as the oracle"); the shipped library never
imports them. Numerics: float32 tensors like the torch CPU backend,
``np.linalg.eigh`` (same LAPACK as torch CPU), Python ``round``
(half-to-even, same as ``torch.round``) for percentile ranks.
"""

from __future__ import annotations

import numpy as np

_RGB2XYZ = np.array(
    [[0.412453, 0.357580, 0.180423], [0.212671, 0.715160, 0.072169], [0.019334, 0.119193, 0.950227]],
    dtype=np.float32,
)
_XYZ2RGB = np.array(
    [[3.2404542, -1.5371385, -0.4985314], [-0.9692660, 1.8760108, 0.0415560], [0.0556434, -0.2040259, 1.0572252]],
    dtype=np.float32,
)
_XYZ_REF = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)


def to_float01(images: np.ndarray) -> np.ndarray:
    """uint8 → [0,1]; float assumed already [0,1] (no max()>1 heuristic)."""
    if images.dtype == np.uint8:
        return images.astype(np.float32) / 255.0
    return images.astype(np.float32)


def rgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    """NCHW float [0,1] (or uint8) → scaled LAB (L×2.55, a/b+128)."""
    rgb = to_float01(rgb)
    linear = np.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92).astype(np.float32)
    xyz = np.einsum("ij,njhw->nihw", _RGB2XYZ, linear)
    xyz_n = xyz / _XYZ_REF.reshape(1, 3, 1, 1)
    f = np.where(xyz_n > 0.008856, np.cbrt(xyz_n), 7.787 * xyz_n + 16.0 / 116.0).astype(np.float32)
    L = (116.0 * f[:, 1:2] - 16.0) * 2.55
    a = 500.0 * (f[:, 0:1] - f[:, 1:2]) + 128.0
    b = 200.0 * (f[:, 1:2] - f[:, 2:3]) + 128.0
    return np.concatenate([L, a, b], axis=1)


def lab_to_rgb(lab: np.ndarray) -> np.ndarray:
    L = lab[:, 0:1] / 2.55
    a = lab[:, 1:2] - 128.0
    b = lab[:, 2:3] - 128.0
    fy = (L + 16.0) / 116.0
    fx = a / 500.0 + fy
    fz = fy - b / 200.0

    def f_inv(t):
        return np.where(t > 0.2068966, t**3, (t - 16.0 / 116.0) / 7.787).astype(np.float32)

    xyz = np.concatenate([f_inv(fx), f_inv(fy), f_inv(fz)], axis=1) * _XYZ_REF.reshape(1, 3, 1, 1)
    linear = np.einsum("ij,njhw->nihw", _XYZ2RGB, xyz)
    with np.errstate(invalid="ignore"):
        rgb = np.where(
            linear > 0.0031308,
            1.055 * np.power(np.abs(linear), 1.0 / 2.4) - 0.055,
            12.92 * linear,
        ).astype(np.float32)
    return np.clip(rgb, 0.0, 1.0)


def restore_dtype(result01_or_255, original_dtype, was_uint8, in_0_255):
    if not in_0_255 and was_uint8:
        result01_or_255 = np.clip(result01_or_255 * 255.0, 0, 255)
    elif in_0_255:
        result01_or_255 = np.clip(result01_or_255, 0, 255)
    return result01_or_255.astype(original_dtype)


# --------------------------------------------------------------- Reinhard
def reinhard_fit(images: np.ndarray):
    lab = rgb_to_lab(to_float01(images))
    return lab.mean(axis=(0, 2, 3)), lab.std(axis=(0, 2, 3), ddof=1)


def reinhard_transform(images: np.ndarray, ref_mean, ref_std):
    original_dtype = images.dtype
    was_uint8 = original_dtype == np.uint8
    lab = rgb_to_lab(to_float01(images))
    mean = lab.mean(axis=(0, 2, 3), keepdims=True)
    std = lab.std(axis=(0, 2, 3), ddof=1, keepdims=True)
    lab_n = ((lab - mean) / (std + 1e-8)) * np.reshape(ref_std, (1, 3, 1, 1)) + np.reshape(
        ref_mean, (1, 3, 1, 1)
    )
    rgb = np.clip(lab_to_rgb(lab_n), 0.0, 1.0)
    return restore_dtype(rgb, original_dtype, was_uint8, in_0_255=False)


# ------------------------------------------------------ Histogram matching
def _to_uint8(images: np.ndarray):
    if images.dtype == np.uint8:
        return images, False
    return np.clip(images.astype(np.float32) * 255.0, 0, 255).astype(np.uint8), True


def hm_fit(images: np.ndarray, channel_axis: int = 1) -> list[np.ndarray]:
    if channel_axis in (-1, 3):
        images = np.transpose(images, (0, 3, 1, 2))
    u8, _ = _to_uint8(images)
    hists = []
    for c in range(u8.shape[1]):
        counts = np.bincount(u8[:, c].reshape(-1), minlength=256).astype(np.float32)
        hists.append(counts / (counts.sum() + 1e-8))
    return hists


def hm_transform(images: np.ndarray, ref_hists: list[np.ndarray], channel_axis: int = 1):
    needs_permute = channel_axis in (-1, 3)
    if needs_permute:
        images = np.transpose(images, (0, 3, 1, 2))
    original_dtype = images.dtype
    was_uint8 = original_dtype == np.uint8
    u8, scale_back = _to_uint8(images)
    n, c, h, w = u8.shape
    ref_values = np.arange(256, dtype=np.float32)
    out_channels = []
    for ci in range(c):
        flat = u8[:, ci].reshape(-1)
        counts = np.bincount(flat, minlength=256).astype(np.float32)
        source_cdf = np.cumsum(counts / (flat.size + 1e-8)).astype(np.float32)
        rh = ref_hists[ci].astype(np.float32)
        rq = np.cumsum(rh / (rh.sum() + 1e-8)).astype(np.float32)
        idx = np.clip(np.searchsorted(rq, source_cdf, side="left"), 1, 255)
        q_left, q_right = rq[idx - 1], rq[idx]
        diff = q_right - q_left
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha = np.where(diff > 1e-10, (source_cdf - q_left) / diff, 0.0).astype(np.float32)
        lut = ref_values[idx - 1] + alpha * (ref_values[idx] - ref_values[idx - 1])
        lut = np.where(source_cdf <= rq[0], ref_values[0], lut)
        # Structural above-max pin (exact occupancy form of the reference's
        # ``source_cdf >= rq[-1]``): exact math has cdf(last occupied
        # bin) = 1 > rq_max < 1, but f32 rounds the compare either way —
        # see ops/histogram_matching.hm_build_lut. Bin b pins iff no
        # occupied bin lies strictly after it (scale-proof: no pixel-count
        # arithmetic at all).
        occ = counts > 0
        occ_after = np.cumsum(occ[::-1])[::-1] - occ.astype(np.int64)
        lut = np.where(occ_after == 0, ref_values[255], lut)
        lut = np.clip(lut, 0, 255).astype(np.float32)
        out_channels.append(lut[flat.astype(np.int64)].reshape(n, h, w))
    matched = np.stack(out_channels, axis=1)
    if scale_back:
        matched = np.clip(matched / 255.0, 0.0, 1.0)
    else:
        matched = np.clip(matched, 0.0, 255.0)
    result = restore_dtype(matched, original_dtype, was_uint8, in_0_255=not scale_back)
    if needs_permute:
        result = np.transpose(result, (0, 2, 3, 1))
    return result


# ---------------------------------------------------------------- Macenko
IO = 240.0
BETA = 0.15
ALPHA = 1.0


def _percentile(t: np.ndarray, q: float) -> float:
    """torchstain nearest-rank: kthvalue(1 + round(.01·q·(n−1)))."""
    k = 1 + round(0.01 * float(q) * (t.size - 1))
    return float(np.partition(t.reshape(-1), k - 1)[k - 1])


def macenko_fit(images: np.ndarray):
    imf = to_float01(images).astype(np.float32)
    od = -np.log((imf * 255.0 + 1.0) / IO)
    od_flat = np.transpose(od, (1, 0, 2, 3)).reshape(3, -1)  # (3, N·H·W)
    od_pix = od_flat.T
    keep = od_pix.min(axis=1) >= BETA
    od_f = od_pix[keep]
    if od_f.shape[0] > 1:
        cov = np.cov(od_f.T.astype(np.float32), ddof=1).astype(np.float32)
    else:
        cov = np.zeros((3, 3), np.float32)
    _, eigvecs = np.linalg.eigh(cov)
    v = eigvecs[:, [1, 2]].astype(np.float32)
    that = od_f @ v
    phi = np.arctan2(that[:, 1], that[:, 0])
    min_phi = _percentile(phi, ALPHA)
    max_phi = _percentile(phi, 100 - ALPHA)
    v_min = v @ np.array([np.cos(min_phi), np.sin(min_phi)], np.float32)
    v_max = v @ np.array([np.cos(max_phi), np.sin(max_phi)], np.float32)
    if v_min[0] > v_max[0]:
        he = np.stack([v_min, v_max], axis=1)
    else:
        he = np.stack([v_max, v_min], axis=1)
    conc = np.linalg.lstsq(he, od_flat, rcond=None)[0]
    max_conc = np.array([_percentile(conc[0], 99), _percentile(conc[1], 99)], np.float32)
    return he.astype(np.float32), max_conc


def macenko_transform(images: np.ndarray, stain_matrix, target_max_conc):
    original_dtype = images.dtype
    was_uint8 = original_dtype == np.uint8
    imf = to_float01(images).astype(np.float32)
    n, c, h, w = imf.shape
    od_all = -np.log((imf * 255.0 + 1.0) / IO)
    out = np.empty((n, 3, h, w), np.float32)
    tmc = np.reshape(target_max_conc, -1).astype(np.float32)
    for i in range(n):
        od = od_all[i]  # (3, H, W)
        od_r = od.transpose(1, 2, 0).reshape(-1, 3)
        keep = od_r.min(axis=1) >= BETA
        od_f = od_r[keep]
        if od_f.shape[0] < 3:
            od_f = od_r
        cov = np.cov(od_f.T.astype(np.float32), ddof=1).astype(np.float32) if od_f.shape[0] > 1 else np.zeros((3, 3), np.float32)
        _, eigvecs = np.linalg.eigh(cov)
        v = eigvecs[:, [1, 2]].astype(np.float32)
        that = od_f @ v
        phi = np.arctan2(that[:, 1], that[:, 0])
        min_phi = _percentile(phi, ALPHA)
        max_phi = _percentile(phi, 100 - ALPHA)
        v_min = v @ np.array([np.cos(min_phi), np.sin(min_phi)], np.float32)
        v_max = v @ np.array([np.cos(max_phi), np.sin(max_phi)], np.float32)
        if v_min[0] > v_max[0]:
            he = np.stack([v_min, v_max], axis=1)
        else:
            he = np.stack([v_max, v_min], axis=1)
        od_i = od.reshape(3, -1)
        conc = np.linalg.lstsq(he, od_i, rcond=None)[0]
        max_c = np.array([_percentile(conc[0], 99), _percentile(conc[1], 99)], np.float32)
        conc_n = conc * (tmc / max_c)[:, None]
        recon = np.clip(IO * np.exp(-(np.asarray(stain_matrix, np.float32) @ conc_n)), 0, 255)
        out[i] = recon.reshape(3, h, w)
    return restore_dtype(out, original_dtype, was_uint8, in_0_255=True)


# ------------------------------------------------- synthetic H&E fixtures
# torchstain default HERef (columns = hematoxylin, eosin) — the physical
# basis for Beer–Lambert fixtures; random RGB noise gives a near-isotropic
# OD covariance making Macenko parity ill-posed (reference test rationale,
# tests/torch_interface/test_correctness_against_references.py:31-44).
HE_REF = np.array(
    [[0.5626, 0.2159], [0.7201, 0.8012], [0.4062, 0.5581]], dtype=np.float32
)


def _smooth_noise(h: int, w: int, rng: np.random.Generator) -> np.ndarray:
    """Low-frequency [0,1] field: coarse noise, bilinearly upsampled."""
    gh, gw = max(h // 8, 1), max(w // 8, 1)
    coarse = rng.random((gh, gw), dtype=np.float32)
    yy = np.linspace(0, gh - 1, h, dtype=np.float32)
    xx = np.linspace(0, gw - 1, w, dtype=np.float32)
    y0 = np.clip(np.floor(yy).astype(int), 0, gh - 1)
    x0 = np.clip(np.floor(xx).astype(int), 0, gw - 1)
    y1 = np.clip(y0 + 1, 0, gh - 1)
    x1 = np.clip(x0 + 1, 0, gw - 1)
    fy = (yy - y0)[:, None]
    fx = (xx - x0)[None, :]
    return (
        coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + coarse[np.ix_(y1, x0)] * fy * (1 - fx)
        + coarse[np.ix_(y0, x1)] * (1 - fy) * fx
        + coarse[np.ix_(y1, x1)] * fy * fx
    ).astype(np.float32)


def synthetic_he_tile(h: int, w: int, seed: int, he_scale: float = 1.0) -> np.ndarray:
    """(1, 3, H, W) uint8 Beer–Lambert tile: I = Io·exp(−(HE·scale) @ C) with
    spatially coherent concentration maps."""
    rng = np.random.default_rng(seed)
    c_h = 0.3 + 1.8 * _smooth_noise(h, w, rng)
    c_e = 0.2 + 1.0 * _smooth_noise(h, w, rng)
    conc = np.stack([c_h, c_e], axis=0).reshape(2, -1)  # (2, P)
    od = (HE_REF * he_scale) @ conc  # (3, P)
    tile = np.clip(IO * np.exp(-od), 0, 255).round().astype(np.uint8)
    return tile.reshape(3, h, w)[None]
