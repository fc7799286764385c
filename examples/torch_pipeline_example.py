"""Stain normalization inside a torch ``DataLoader`` training pipeline.

Counterpart of the reference's ``examples/torch_transform_example.py``
(torchvision ``v2.Compose`` + ``StainNormalizerTransform`` in a
``DataLoader`` loop): a plain-torch ``Dataset`` over the committed H&E
tiles feeds batches through :class:`stainx_tpu.interop.
TorchStainNormalizerTransform` — torch tensors in, normalized torch
tensors out, with the JAX/TPU compute path doing the work. torchvision
is not required (this environment does not ship it); the adapter slots
into a ``v2.Compose`` the same way when it is present.

Run::

    python examples/torch_pipeline_example.py [--batch 4] [--method macenko]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument(
        "--method", default="macenko", choices=["macenko", "reinhard", "histogram_matching"]
    )
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    try:
        import torch
        from torch.utils.data import DataLoader, Dataset
    except ImportError:
        print("torch not installed; this example needs it. Skipping.")
        return

    from PIL import Image

    from stainx_tpu.interop import TorchStainNormalizerTransform

    class TilesDataset(Dataset):
        """CHW uint8 tensors from the committed example tiles (repeated so
        a couple of epochs exercise several batches)."""

        def __init__(self, repeat: int = 4):
            paths = sorted(
                p
                for p in glob.glob(os.path.join(_DATA, "*.png"))
                if os.path.basename(p) != "target.png"
            )
            if not paths:
                raise SystemExit(f"no tiles under {_DATA} — run examples/make_data.py")
            self.paths = paths * repeat

        def __len__(self) -> int:
            return len(self.paths)

        def __getitem__(self, i: int):
            img = np.asarray(Image.open(self.paths[i]).convert("RGB"), dtype=np.uint8)
            return torch.from_numpy(np.transpose(img, (2, 0, 1)))  # CHW uint8

    ref = torch.from_numpy(
        np.transpose(
            np.asarray(Image.open(os.path.join(_DATA, "target.png")).convert("RGB")),
            (2, 0, 1),
        )[None]
    )

    # The adapter is an nn.Module: compose it like any torchvision batch
    # transform. Fit happens once, on construction (reference mode).
    normalize = TorchStainNormalizerTransform(method=args.method, reference=ref)

    loader = DataLoader(TilesDataset(), batch_size=args.batch, shuffle=False)

    # Warm-up: the first batch of a new shape pays the one-time XLA
    # compile (~tens of seconds on a cold TPU); steady-state throughput is
    # what a training loop sees afterwards.
    warm = next(iter(loader))
    normalize(warm)

    n_imgs = 0
    start = time.perf_counter()
    for epoch in range(args.epochs):
        for batch in loader:
            out = normalize(batch)  # torch in -> torch out (see interop docs)
            n_imgs += out.shape[0]
            # ... the training step would consume `out` here ...
    elapsed = time.perf_counter() - start

    print(
        f"{args.method}: {n_imgs} tiles through the DataLoader pipeline in "
        f"{elapsed:.2f}s ({n_imgs / elapsed:.1f} img/s incl. host<->device, "
        f"PNG decode amortized by the loader)"
    )
    print(f"output: {tuple(out.shape)} {out.dtype}, range [{out.min():.3f}, {out.max():.3f}]")


if __name__ == "__main__":
    main()
