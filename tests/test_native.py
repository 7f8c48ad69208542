"""Native C++ host ops vs the numpy/pandas oracle."""

import numpy as np
import pytest

from mggan_tpu import native
from mggan_tpu.data.dataset import BIG_MARGIN


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib failed to build"
)


def test_parse_numeric_txt(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("1.0\t2\t3.5\t-4e2\n5 6 7 8\n")
    out = native.parse_numeric_txt(p)
    np.testing.assert_allclose(out, [1.0, 2, 3.5, -400, 5, 6, 7, 8])
    # non-numeric -> None (pandas fallback)
    q = tmp_path / "g.txt"
    q.write_text("1\tPedestrian\t2\n")
    assert native.parse_numeric_txt(q) is None


def test_extract_patches_matches_numpy():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (50, 70, 3), np.uint8)
    centers = np.array([[5, 5], [0, 0], [69, 49], [35, 25], [-10, 80]])
    got = native.extract_patches(img, centers, BIG_MARGIN)

    side = 2 * BIG_MARGIN + 1
    for i, (cx, cy) in enumerate(centers):
        ref = np.zeros((side, side, 3), np.uint8)
        x0, y0 = cx - BIG_MARGIN, cy - BIG_MARGIN
        sx0, sy0 = max(x0, 0), max(y0, 0)
        sx1, sy1 = min(x0 + side, 70), min(y0 + side, 50)
        if sx1 > sx0 and sy1 > sy0:
            ref[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = img[sy0:sy1, sx0:sx1]
        np.testing.assert_array_equal(got[i], ref)


def test_window_presence():
    present = np.array(
        [
            [1] * 25,
            [0] * 5 + [1] * 20,
            [1] * 10 + [0] + [1] * 14,
        ],
        np.uint8,
    )
    keep = native.window_presence(present, seq_len=20, skip=1)
    assert keep.shape == (6, 3)
    assert keep[:, 0].all()  # always present
    assert keep[:, 1].tolist() == [0, 0, 0, 0, 0, 1]  # enters at frame 5
    assert not keep[:, 2].any()  # gap at frame 10 kills every window


def test_native_biwi_load_matches_pandas(tmp_path):
    """End-to-end: the native fast path must equal the pandas path."""
    from mggan_tpu.data import parsing, registry

    rows = []
    rng = np.random.RandomState(0)
    for f in range(30):
        for p in range(3):
            y, x = rng.rand(2) * 10
            rows.append(f"{float(f)}\t{float(p)}\t{y:.6f}\t{x:.6f}")
    path = tmp_path / "t.txt"
    path.write_text("\n".join(rows))
    info = registry.get_info("eth")

    fast = parsing._load_txt_native(path, info)
    assert fast is not None
    slow = parsing.load_txt.__wrapped__(path, info) if hasattr(
        parsing.load_txt, "__wrapped__"
    ) else None
    # compare against pandas directly
    import pandas as pd

    df = pd.read_csv(path, header=None, delimiter="\t")
    df.columns = info.data_columns
    ref = np.asarray(df[["frame", "ID", "x", "y"]].values, np.float64)
    np.testing.assert_allclose(fast, ref, atol=1e-9)
