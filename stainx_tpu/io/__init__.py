"""Host-side tile IO pipeline (native C++ runtime component).

The reference integrates with torch DataLoader workers for input pipelines
(SURVEY §2.3 item 3); the TPU-native equivalent is a threaded C++ reader
(:mod:`tilepipe`) that fills pre-allocated batch buffers from raw tile
files while the previous batch computes on device — double-buffered host
IO without Python-thread GIL contention.

Usage::

    from stainx_tpu.io import RawTileLoader

    loader = RawTileLoader(paths, tile_shape=(3, 256, 256), batch_size=64)
    for batch in loader:          # numpy (B, 3, H, W) uint8, zero-copy views
        out = normalizer.transform(batch)
"""

from stainx_tpu.io.tilepipe import RawTileLoader, TilePipe, tilepipe_available

__all__ = ["RawTileLoader", "TilePipe", "tilepipe_available"]
