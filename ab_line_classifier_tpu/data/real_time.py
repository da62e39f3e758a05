"""Prospective (real-time) dataset ingestion (reference
``src/data/real_time.py``).

Builds a frames dataset from WaveBase-device prospective recordings: walks
dated directories of masked clips, maps Labelbox expert annotations to binary
classes (with the configurable ``RT_B_LINES_3_CLASS`` assignment for
fewer-than-3-B-line clips), decomposes clips into frames, and emits a frames
table *without* patient ids (real-time clips carry none).

Unlike the reference this module has no import-time config load; functions
take ``cfg`` explicitly.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import pandas as pd

from ab_line_classifier_tpu.config import Config


def get_rt_masked_clip_paths(cfg: Config) -> pd.DataFrame:
    """Paths to all prospective masked clips (reference real_time.py:13-36)."""
    rootdir = cfg["PATHS"]["RT_ROOT_DIR"]
    clips_dir = "masked_recordings"
    data = []
    dated_dirs = next(os.walk(rootdir))[1] if os.path.isdir(rootdir) else []
    for dated_dir in dated_dirs:
        for root, _, files in os.walk(os.path.join(rootdir, dated_dir,
                                                   clips_dir)):
            for clip in files:
                clip_id = clip.split(".")[0]
                # Skip non-clip files: this repo's own auto-masking writes
                # a mask.jpg beside every masked clip, and the reference's
                # int() (real_time.py:32) would abort the whole table build
                # on the first one.
                if not clip_id.isdigit():
                    continue
                path_name = os.path.join(rootdir, dated_dir, clips_dir,
                                         clip_id)
                data.append([int(clip_id), path_name])
    return pd.DataFrame(data, columns=["filename", "Path"])


def _rt_label_to_class(label, b_lines_3_class: str) -> int:
    """Reference's nested-conditional mapping (real_time.py:62-67)."""
    b_lines_3_dict = {"b_lines": 1, "a_lines": 0}
    if label == "a_lines":
        return 0
    if label == "b_lines_3":
        return b_lines_3_dict[b_lines_3_class]
    if label in ("b_lines_moderate_50_pleural_line",
                 "b_lines_severe_50_pleural_line"):
        return 1
    if label == "non_a_non_b":
        return 0
    return -1


def create_rt_ABline_dataframe(cfg: Config, lb_annot: Optional[str] = None,
                               b_lines_3_class: Optional[str] = None,
                               preprocessed: bool = False) -> pd.DataFrame:
    """Labelbox annotations -> clips table (reference real_time.py:39-77).

    :param preprocessed: True = ``lb_annot`` is a CSV with ``filename`` /
        ``a_or_b_lines`` columns; False = raw Labelbox Excel export whose
        ``External ID`` prefixes are integer video ids.
    """
    lb_annot = lb_annot or cfg["PATHS"]["RT_LABELBOX_ANNOTATIONS"]
    b_lines_3_class = b_lines_3_class or cfg["DATA"]["RT_B_LINES_3_CLASS"]

    if not preprocessed and lb_annot.endswith((".xlsx", ".xls")):
        df = pd.read_excel(lb_annot)
        df["filename"] = df["External ID"].map(lambda v: int(str(v)[:10]))
        df = df[["filename", "a_or_b_lines"]]
    else:
        df = pd.read_csv(lb_annot)

    df = df.copy()
    df["class"] = df["a_or_b_lines"].map(
        lambda v: _rt_label_to_class(v, b_lines_3_class))
    df["a_or_b_lines"] = df["a_or_b_lines"].replace({
        "b_lines_3": b_lines_3_class,
        "b_lines_moderate_50_pleural_line": "b_lines",
        "b_lines_severe_50_pleural_line": "b_lines",
    })

    path_df = get_rt_masked_clip_paths(cfg)
    return df.merge(path_df, how="outer", on="filename")


def mp4_to_images(cfg: Config, mp4_path: str) -> List[str]:
    """Masked clip -> ``{clip}_{idx}.jpg`` frames (reference :79-105)."""
    from ab_line_classifier_tpu.data.video import mp4_to_frames
    return mp4_to_frames(cfg["PATHS"]["FRAMES"], mp4_path)


def create_rt_image_dataset(cfg: Config, query_df_path: str) -> None:
    """Frames table for real-time clips — no patient_id column (reference
    :108-127)."""
    query_df = pd.read_csv(query_df_path)
    clip_dfs = []
    classes = cfg["DATA"]["CLASSES"]
    for _, row in query_df.iterrows():
        for mp4_file in glob.glob(
                os.path.join(str(row["Path"]), f"{row['filename']}.mp4")):
            image_paths = mp4_to_images(cfg, mp4_file)
            clip_dfs.append(pd.DataFrame({
                "Frame Path": image_paths,
                "Class": row["class"],
                "Class Name": classes[row["class"]],
            }))
    all_clips_df = pd.concat(clip_dfs, axis=0, ignore_index=True)
    all_clips_df.to_csv(cfg["PATHS"]["FRAME_TABLE"], index=False)


if __name__ == "__main__":
    from ab_line_classifier_tpu.config import load_config

    _cfg = load_config()
    create_rt_ABline_dataframe(_cfg)
    create_rt_image_dataset(_cfg, _cfg["PATHS"]["CLIPS_TABLE"])
