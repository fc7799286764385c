"""Generate the committed hermetic example tiles (``examples/data/``).

The reference ships six real H&E PNGs (``examples/data/`` upstream) that its
examples and docs consume. Real tiles cannot be vendored here (no network
egress, and upstream's images are only ever READ from the mount, never
copied), so the committed tiles are **synthetic Beer–Lambert renders**,
license-clean by construction. They go beyond the smooth test fixtures
(``tests/oracles/numpy_reference.synthetic_he_tile``) to exercise the same
structures real tissue does:

- white background regions (lumina / tears) → β-filter masking,
- dense hematoxylin "nuclei" blobs on an eosin stroma,
- fine-grain texture + per-tile stain-matrix rotation and intensity shifts
  so normalization visibly changes the images.

Deterministic (fixed seeds): re-running reproduces the committed PNGs
byte-for-byte. Run ``python examples/make_data.py`` to regenerate.
"""

from __future__ import annotations

import os

import numpy as np

IO = 240.0
# Landini H&E OD vectors, columns = [H, E] (the standard published basis the
# whole pipeline is built around; ops/macenko.py uses the same constants).
HE_REF = np.array(
    [[0.5626, 0.2159], [0.7201, 0.8012], [0.4062, 0.5581]], dtype=np.float64
)

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
SIZE = 384


def _smooth(h: int, w: int, rng: np.random.Generator, cells: int) -> np.ndarray:
    """Low-frequency [0,1] field: coarse noise, bilinearly upsampled."""
    gh, gw = max(h // cells, 2), max(w // cells, 2)
    coarse = rng.random((gh, gw)).astype(np.float64)
    yy = np.linspace(0, gh - 1, h)
    xx = np.linspace(0, gw - 1, w)
    y0 = np.clip(np.floor(yy).astype(int), 0, gh - 2)
    x0 = np.clip(np.floor(xx).astype(int), 0, gw - 2)
    fy = (yy - y0)[:, None]
    fx = (xx - x0)[None, :]
    return (
        coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + coarse[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
        + coarse[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
        + coarse[np.ix_(y0 + 1, x0 + 1)] * fy * fx
    )


def _rot3(axis: np.ndarray, angle: float) -> np.ndarray:
    """Rodrigues rotation matrix — perturbs the stain basis per tile."""
    a = axis / np.linalg.norm(axis)
    k = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def make_tile(
    seed: int,
    h: int = SIZE,
    w: int = SIZE,
    he_scale: float = 1.0,
    rot_deg: float = 0.0,
    background_frac: float = 0.15,
) -> np.ndarray:
    """(H, W, 3) uint8 synthetic H&E tile with background + nuclei."""
    rng = np.random.default_rng(seed)

    # Stroma: eosin-dominant, spatially coherent.
    c_e = 0.25 + 1.1 * _smooth(h, w, rng, 48) + 0.25 * _smooth(h, w, rng, 12)
    c_h = 0.15 + 0.5 * _smooth(h, w, rng, 48)

    # Nuclei: dense hematoxylin blobs where a fine field exceeds a threshold.
    nuc = _smooth(h, w, rng, 6)
    nuc_mask = nuc > np.quantile(nuc, 0.82)
    c_h = np.where(nuc_mask, c_h + 1.4 + 0.8 * _smooth(h, w, rng, 6), c_h)
    c_e = np.where(nuc_mask, c_e * 0.45, c_e)

    # Fine-grain texture on both stains.
    c_h *= 1.0 + 0.12 * (rng.standard_normal((h, w)) * 0.5)
    c_e *= 1.0 + 0.12 * (rng.standard_normal((h, w)) * 0.5)
    c_h = np.clip(c_h, 0.0, None)
    c_e = np.clip(c_e, 0.0, None)

    # Background: concentrations fade to ~0 where a coarse field is low
    # (smoothstep edge so the transition is tissue-like, not a hard cut).
    bg = _smooth(h, w, rng, 96)
    t = np.clip((bg - np.quantile(bg, background_frac)) / 0.08, 0.0, 1.0)
    fade = t * t * (3 - 2 * t)
    c_h *= fade
    c_e *= fade

    basis = _rot3(np.array([0.2, -0.5, 1.0]), np.deg2rad(rot_deg)) @ (HE_REF * he_scale)
    od = np.einsum("ij,jhw->ihw", basis, np.stack([c_h, c_e]))
    rgb = np.clip(IO * np.exp(-od) + rng.standard_normal((3, h, w)) * 0.8, 0, 255)
    return np.transpose(rgb.round().astype(np.uint8), (1, 2, 0))


# name -> (seed, he_scale, rot_deg, background_frac)
TILES = {
    "target.png": (42, 1.00, 0.0, 0.12),
    "test_1.png": (101, 1.18, 6.0, 0.20),
    "test_2.png": (202, 0.82, -5.0, 0.10),
    "test_3.png": (303, 1.05, 10.0, 0.30),
    "test_4.png": (404, 0.90, -9.0, 0.05),
    "test_5.png": (505, 1.25, 3.0, 0.45),
}


def main() -> None:
    from PIL import Image

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, (seed, scale, rot, bgf) in TILES.items():
        tile = make_tile(seed, he_scale=scale, rot_deg=rot, background_frac=bgf)
        path = os.path.join(OUT_DIR, name)
        Image.fromarray(tile).save(path, optimize=True)
        print(f"{path}: {tile.shape} {os.path.getsize(path) / 1024:.0f} KiB")


if __name__ == "__main__":
    main()
