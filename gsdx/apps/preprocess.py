"""Preprocessing CLI (reference `src/preprocess.py:296-304`).

Usage: python -m gsdx.apps.preprocess --config configs/rope.yaml
"""

from __future__ import annotations

import argparse
import glob
from pathlib import Path

from gsdx.io.preprocess import preprocess_episode


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    args = p.parse_args(argv)

    import yaml

    with open(args.config) as f:
        raw = yaml.safe_load(f)
    ds = raw["dataset_config"]["datasets"][0]
    tc = raw["train_config"]

    base = Path(ds["base_dir"])
    name = ds["name"]
    data_dir = base / "data" / name
    output_dir = base / "ckpts" / f"exp_{name}"
    prep_dir = base / "preprocessed" / f"exp_{name}"

    episodes = sorted(glob.glob(str(output_dir / "episode_*")))
    episode_idxs = [int(e.split("_")[-1]) for e in episodes]
    n_ok = 0
    for idx in episode_idxs:
        epi_data = data_dir / f"episode_{idx:02d}"
        epi_out = (output_dir / f"episode_{idx:02d}" / name /
                   f"episode_{idx:02d}")
        epi_prep = prep_dir / f"episode_{idx:02d}"
        if not (epi_out / "params.npz").exists():
            continue
        try:
            rows = preprocess_episode(
                str(epi_data), str(epi_out), str(epi_prep),
                dist_thresh=tc.get("dist_thresh", 0.01),
                n_his=tc["n_his"], n_future=tc["n_future"], episode_idx=idx,
            )
        except ValueError as e:
            print(f"episode {idx} failed: {e}")
            continue
        if rows is None:
            print(f"episode {idx} invalid")
            continue
        print(f"episode {idx}: {len(rows)} unit pushes")
        n_ok += 1
    print(f"preprocessed {n_ok}/{len(episode_idxs)} episodes")


if __name__ == "__main__":
    main()
