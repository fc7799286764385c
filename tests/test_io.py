"""Native tilepipe IO pipeline: correctness vs direct numpy reads."""

import numpy as np
import pytest

from stainx_tpu.io import RawTileLoader, TilePipe, tilepipe_available


@pytest.fixture
def tile_dir(tmp_path):
    rng = np.random.default_rng(0)
    shape = (3, 16, 16)
    tiles = []
    for i in range(11):
        tile = rng.integers(0, 256, shape, dtype=np.uint8)
        path = tmp_path / f"tile_{i:03d}.raw"
        tile.tofile(path)
        tiles.append((str(path), tile))
    return shape, tiles


def test_native_library_builds():
    assert tilepipe_available(), "g++ toolchain present but tilepipe failed to build"


def test_loader_matches_direct_reads(tile_dir):
    shape, tiles = tile_dir
    loader = RawTileLoader([p for p, _ in tiles], tile_shape=shape, batch_size=4)
    assert len(loader) == 3
    seen = 0
    for batch in loader:
        for row in batch:
            np.testing.assert_array_equal(row, tiles[seen][1])
            seen += 1
    assert seen == 11  # remainder batch included


def test_loader_drop_remainder(tile_dir):
    shape, tiles = tile_dir
    loader = RawTileLoader(
        [p for p, _ in tiles], tile_shape=shape, batch_size=4, drop_remainder=True
    )
    assert len(loader) == 2
    assert sum(b.shape[0] for b in loader) == 8


@pytest.mark.skipif(not tilepipe_available(), reason="native tilepipe unavailable")
def test_tilepipe_low_level(tile_dir):
    shape, tiles = tile_dir
    tile_bytes = int(np.prod(shape))
    pipe = TilePipe(slot_bytes=4 * tile_bytes, n_slots=2, n_threads=2)
    try:
        paths = [p for p, _ in tiles[:4]]
        pipe.enqueue(0, paths, [i * tile_bytes for i in range(4)], [tile_bytes] * 4)
        pipe.wait(0)
        view = pipe.buffer(0).reshape(4, *shape)
        for i in range(4):
            np.testing.assert_array_equal(view[i], tiles[i][1])
    finally:
        pipe.close()


@pytest.mark.skipif(not tilepipe_available(), reason="native tilepipe unavailable")
def test_missing_file_raises(tile_dir, tmp_path):
    shape, tiles = tile_dir
    tile_bytes = int(np.prod(shape))
    pipe = TilePipe(slot_bytes=2 * tile_bytes, n_slots=1, n_threads=1)
    try:
        pipe.enqueue(0, [str(tmp_path / "missing.raw")], [0], [tile_bytes])
        with pytest.raises(OSError, match="read"):
            pipe.wait(0)
    finally:
        pipe.close()


def test_feeds_normalizer(tile_dir):
    from stainx_tpu import Reinhard

    shape, tiles = tile_dir
    loader = RawTileLoader([p for p, _ in tiles], tile_shape=shape, batch_size=4)
    norm = Reinhard(device="cpu").fit(tiles[0][1][None])
    for batch in loader:
        out = norm.transform(batch)
        assert out.shape == batch.shape


def test_path_entries_accepted(tile_dir):
    """pathlib.Path entries must work on BOTH paths — the numpy fallback
    always accepted them; the native enqueue crashed on .encode()
    (round-3 review finding: environment-dependent behavior)."""
    from pathlib import Path

    shape, tiles = tile_dir
    loader = RawTileLoader([Path(p) for p, _ in tiles], tile_shape=shape, batch_size=4)
    seen = 0
    for batch in loader:
        for row in batch:
            np.testing.assert_array_equal(row, tiles[seen][1])
            seen += 1
    assert seen == 11


def test_collected_batches_final_is_owned(tile_dir):
    """The FINAL batch is yielded as a copy: in the natural
    ``[b for b in loader]`` pattern it would otherwise alias freed slot
    memory the moment iteration ends (round-3 review finding). Earlier
    batches remain zero-copy views per the documented contract."""
    shape, tiles = tile_dir
    loader = RawTileLoader([p for p, _ in tiles], tile_shape=shape, batch_size=4)
    batches = [b for b in loader]
    # The final batch must still read back correctly AFTER the pipe closed.
    last = batches[-1]
    np.testing.assert_array_equal(last[-1], tiles[-1][1])
    assert last.flags.owndata or last.base is None or not tilepipe_available()


def test_degenerate_pipe_args_rejected():
    """slot_bytes<=0 / n_slots<1 / n_threads<1 raise an actionable
    ValueError instead of allocating nothing and deadlocking the first
    wait() forever (round-3 review finding)."""
    for kwargs in (
        dict(slot_bytes=0),
        dict(slot_bytes=64, n_slots=0),
        dict(slot_bytes=64, n_threads=0),
        dict(slot_bytes=64, n_slots=-1),
    ):
        with pytest.raises(ValueError, match="tilepipe needs"):
            TilePipe(**kwargs)


def test_invalid_slot_raises_not_ub():
    """tp_wait / tp_buffer bounds-check the slot index (a bad slot from the
    public TilePipe API previously indexed out of bounds in native code)."""
    from stainx_tpu.io.tilepipe import TilePipe, tilepipe_available

    if not tilepipe_available():
        pytest.skip("native tilepipe unavailable")
    pipe = TilePipe(slot_bytes=64, n_slots=2, n_threads=1)
    try:
        with pytest.raises(ValueError, match="invalid slot"):
            pipe.wait(5)
        with pytest.raises(ValueError, match="invalid slot"):
            pipe.buffer(-1)
    finally:
        pipe.close()
