"""File ingestion: txt parsing, windowing, image pyramid, big-patch crops.

Replaces the reference's eager per-file Python windowing
(trajectories_scene.py:125-201, BaseTrajectories.py:70-155) with vectorised
numpy: the 20-frame sliding windows and the full-presence filter are
computed with a presence matrix instead of per-ped loops.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mggan_tpu.config import OBS_LEN
from mggan_tpu.data.dataset import SceneDataset, SEQ_LEN, extract_big_patches
from mggan_tpu.data import registry


def _load_txt_native(path, info: registry.DatasetInfo):
    """Fast path: the C++ tokenizer (native/src/host_ops.cpp) for fully
    numeric files (BIWI/GOFP).  Returns None when unavailable or when the
    file has non-numeric columns (SDD label strings) — callers fall back to
    pandas."""
    if info.row_filters:
        return None  # filters reference string columns
    from mggan_tpu import native

    if not native.available():
        return None
    flat = native.parse_numeric_txt(path)
    if flat is None:
        return None
    ncol = len(info.data_columns)
    if len(flat) % ncol != 0:
        return None
    arr = flat.reshape(-1, ncol)
    cols = {c: i for i, c in enumerate(info.data_columns)}
    take = [cols["frame"], cols["ID"], cols["x"], cols["y"]]
    if "is_active" in cols:
        take.append(cols["is_active"])
    out = arr[:, take]
    if info.framerate is not None:
        step = int(round(info.framerate * 0.4))
        out = out[out[:, 0] % step == 0].copy()
        out[:, 0] = out[:, 0] // step
    return out


def load_txt(path: Path, info: registry.DatasetInfo) -> np.ndarray:
    """-> float array with columns (frame, ID, x, y[, is_active]).

    Applies row filters (SDD label/lost), frame subsampling for datasets with
    a framerate (frame % round(framerate*0.4) == 0, then renumbered;
    BaseTrajectories.py:145-147), and the BIWI y/x column swap.
    """
    fast = _load_txt_native(path, info)
    if fast is not None:
        return fast

    import pandas as pd

    df = pd.read_csv(path, header=None, delimiter=info.delim)
    df.columns = info.data_columns[: len(df.columns)]
    for col, val in info.row_filters.items():
        if col in df:
            df = df[df[col] == val]
    if info.framerate is not None:
        step = int(round(info.framerate * 0.4))
        df = df[df["frame"] % step == 0].copy()
        df["frame"] = df["frame"] // step
    cols = ["frame", "ID", "x", "y"]
    if "is_active" in df.columns:
        cols.append("is_active")
    return np.asarray(df[cols].values, dtype=np.float64)


def window_scene(data: np.ndarray, skip: int = 1, seq_len: int = SEQ_LEN,
                 inclusive: bool = False):
    """Slide ``seq_len``-frame (default 20) windows; keep peds present in all
    consecutive frames (trajectories_scene.py:149-181).

    Args:
        data: (rows, 4|5) (frame, ID, x, y[, is_active]).
        seq_len: window length; ``seq_len=OBS_LEN`` yields observation-only
            windows for serving-time inference (no futures in the file).
        inclusive: count windows as ``floor((F-L)/skip)+1`` (so a file with
            exactly ``seq_len`` frames yields one window) and, when ``F-L``
            is not a multiple of ``skip``, append one clamped window at
            start ``F-L`` — the window ending at the newest frame is
            therefore ALWAYS produced. The default ``ceil((F-L)/skip)``
            reproduces the reference's training-window count
            (trajectories_scene.py:156), which drops that final window —
            serving-time consumers (cli/serve.py) want it.

    Returns:
        list of (xy (n,seq_len,2) float32 [NaN future if inactive],
        ped_ids (n,)).
    """
    SEQ_LEN = seq_len
    if len(data) == 0:
        return []
    frames = np.unique(data[:, 0])
    frames.sort()
    frame_index = {f: i for i, f in enumerate(frames)}
    ids = np.unique(data[:, 1])
    id_index = {p: i for i, p in enumerate(ids)}

    nf, np_ = len(frames), len(ids)
    pos = np.full((np_, nf, 2), np.nan, np.float32)
    active = np.ones((np_, nf), bool)
    fi = np.array([frame_index[f] for f in data[:, 0]])
    pi = np.array([id_index[p] for p in data[:, 1]])
    pos[pi, fi] = data[:, 2:4]
    if data.shape[1] == 5:
        active[pi, fi] = data[:, 4] != 0
    present = np.zeros((np_, nf), bool)
    present[pi, fi] = True

    if nf < SEQ_LEN:
        num_seq = 0
    elif inclusive:
        num_seq = (nf - SEQ_LEN) // skip + 1
    else:
        num_seq = int(np.ceil((nf - SEQ_LEN) / skip))
    if num_seq <= 0:
        return []

    # Full-presence keep matrix (num_seq, P): C++ prefix-sum fast path with a
    # vectorised numpy twin (equality pinned by tests/test_native.py).
    from mggan_tpu import native

    starts = np.arange(num_seq) * skip
    # inclusive + skip>1: clamp one final start to F-L when the strided grid
    # misses it, so the newest-frame window is guaranteed (ADVICE r3).
    if inclusive and (nf - SEQ_LEN) % skip != 0:
        starts = np.append(starts, nf - SEQ_LEN)
    if native.available():
        keep = native.window_presence(
            np.ascontiguousarray(present, np.uint8), SEQ_LEN, skip
        )[:num_seq].astype(bool)
        if len(starts) > num_seq:  # clamped tail start is off the skip grid
            cs = np.concatenate(
                [np.zeros((np_, 1), np.int32), np.cumsum(present, 1)], axis=1
            )
            tail = (cs[:, starts[-1] + SEQ_LEN] - cs[:, starts[-1]]) == SEQ_LEN
            keep = np.concatenate([keep, tail[None]], axis=0)
    else:
        cs = np.concatenate(
            [np.zeros((np_, 1), np.int32), np.cumsum(present, 1)], axis=1
        )
        keep = ((cs[:, starts + SEQ_LEN] - cs[:, starts]) == SEQ_LEN).T

    # consecutive-frame requirement: window frames must be contiguous ints
    gapsum = np.concatenate([[0], np.cumsum(np.diff(frames) != 1)])

    out = []
    for w in range(len(starts)):
        start = starts[w]
        if gapsum[start + SEQ_LEN - 1] != gapsum[start]:
            continue
        window_present = keep[w]
        if not window_present.any():
            continue
        sel = np.where(window_present)[0]
        xy = pos[sel, start : start + SEQ_LEN].copy()
        act = active[sel, start : start + SEQ_LEN]
        inactive = ~act.all(axis=1)
        xy[inactive, OBS_LEN:] = np.nan  # trajectories_scene.py:171-175
        out.append((xy.astype(np.float32), ids[sel].astype(np.int64)))
    return out


def build_image_entry(img: np.ndarray, info: registry.DatasetInfo, ratio: float):
    """Scene-image pyramid entry (BaseTrajectories.py:70-121): rescale to the
    canonical 0.05 m/px 'scaled' image, then to the patch ('small') image at
    ``scaling_small`` m/px."""
    import cv2

    if info.homography != "none":
        scale_factor = ratio / info.img_scaling
        new_size = (
            int(round(img.shape[1] * scale_factor)),
            int(round(img.shape[0] * scale_factor)),
        )
        scaled = cv2.resize(img, new_size, interpolation=cv2.INTER_AREA)
    else:
        scale_factor = 1.0
        scaled = img
    def down(src, m_per_px):
        f = info.img_scaling / m_per_px
        size = (
            max(int(round(src.shape[1] * f)), 1),
            max(int(round(src.shape[0] * f)), 1),
        )
        return cv2.resize(src, size, interpolation=cv2.INTER_AREA)

    return {
        "ratio": ratio,
        "scale_factor": scale_factor,
        "scaled": scaled,
        "small": down(scaled, info.scaling_small),
        # debug pyramid level (BaseTrajectories.py:104-110); unused by
        # train/eval, consumed by viz.plot_scene_window(image_type="tiny")
        "tiny": down(scaled, info.scaling_tiny),
        # meters-per-pixel of each level, for world->pixel registration in
        # viz.plot_scene_window (img_scaling is per-dataset, NOT always 0.05)
        "m_per_px": {
            "scaled": info.img_scaling,
            "small": info.scaling_small,
            "tiny": info.scaling_tiny,
        },
    }


def load_scene_dataset(name: str, phase: str, data_root="./data/datasets",
                       skip: int = 1) -> SceneDataset:
    """Full ingestion for one dataset/phase directory.

    Directory layout (reference README + experiments.py): txt files named
    ``<phase>_<scene>.txt`` (anything before the first underscore is
    dropped, trajectories_scene.py:135) and scene images ``<scene>.jpg``.
    """
    import cv2

    info = registry.get_info(name)
    d = registry.phase_dir(data_root, name, phase)
    if not d.is_dir():
        raise FileNotFoundError(
            f"dataset dir {d} not found — download the reference data release "
            f"into {Path(data_root) / name}"
        )

    ratios = {}
    if info.homography == "sdd_csv":
        ratios = registry.load_sdd_ratios(data_root, name)
    elif info.homography == "gofp_table":
        ratios = dict(registry.GOFP_RATIOS)

    images = {}
    for img_path in sorted(d.glob("*.jpg")):
        scene = img_path.stem
        if scene.endswith("-op"):
            continue  # occupancy variants unused (load_occupancy=False)
        img = cv2.cvtColor(cv2.imread(str(img_path)), cv2.COLOR_BGR2RGB)
        images[scene] = build_image_entry(img, info, ratios.get(scene, 1.0))
    if not images:
        raise AssertionError(f"No valid images in folder {d}")

    trajs, names, ped_ids, patch_list = [], [], [], []
    for txt in sorted(d.glob("*.txt")):
        scene = "_".join(txt.stem.split("_")[1:]) or txt.stem
        if scene not in images:
            continue
        data = load_txt(txt, info)
        windows = window_scene(data, skip=skip)
        entry = images[scene]
        for xy, pids in windows:
            xy_m = xy.copy()
            if info.scale:
                xy_m *= entry["scale_factor"]  # scale_func
            if info.norm2meters:
                xy_m *= info.img_scaling  # scale2meters
            trajs.append(xy_m)
            names.append(scene)
            ped_ids.append(pids)
            centers = xy_m[:, OBS_LEN - 1] / info.scaling_small
            patch_list.append(extract_big_patches(entry["small"], centers))

    return SceneDataset(
        dataset_name=name,
        trajectories=trajs,
        scene_names=names,
        images=images,
        big_patches=patch_list,
        format="meter" if (info.fmt == "meter" or info.norm2meters) else info.fmt,
        px_per_meter=1.0 / info.scaling_small,
        ped_ids=ped_ids,
    )


def filter_split(ds: SceneDataset, split: str) -> SceneDataset:
    """Upper/lower intersection filter for the synthetic SDD sets
    (data_loaders.py:40-64): keep windows where any ped's position at the
    first prediction step has y > 16 (lower) / <= 16 (upper)."""
    keep = []
    for i, traj in enumerate(ds.trajectories):
        y8 = traj[:, OBS_LEN, 1]
        sel = (y8 > 16.0) if split == "lower" else (y8 <= 16.0)
        if np.any(sel):
            keep.append(i)
    return SceneDataset(
        dataset_name=ds.dataset_name,
        trajectories=[ds.trajectories[i] for i in keep],
        scene_names=[ds.scene_names[i] for i in keep],
        images=ds.images,
        big_patches=[ds.big_patches[i] for i in keep] if ds.big_patches else None,
        format=ds.format,
        px_per_meter=ds.px_per_meter,
        ped_ids=[ds.ped_ids[i] for i in keep] if ds.ped_ids else None,
    )
