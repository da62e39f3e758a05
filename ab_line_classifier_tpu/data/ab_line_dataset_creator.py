"""A/B-line dataset creator (reference ``src/data/ab_line_dataset_creator.py``).

Concrete :class:`DatasetCreator`: SQL query -> labeled clips table (multi-
severity B-line labels collapsed to class 1) -> S3 pull -> auto-mask ->
frame decomposition -> frames table with columns
``Frame Path, patient_id, Class, Class Name, id``.

The MySQL dependency is optional (imported only inside ``query_to_df``, with
a CSV passthrough when a query table already exists locally), so the rest of
the pipeline runs without database credentials.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import List, Optional

import pandas as pd

from ab_line_classifier_tpu.data.dataset_creator import DatasetCreator

logging.basicConfig(format="[%(levelname)s] %(message)s", level=logging.INFO)

# Reference label -> class mapping (ab_line_dataset_creator.py:118-127).
LABEL_TO_CLASS_MAP = {
    "a_lines": 0,
    "b_lines_<_3": 1,
    "b_lines-_moderate_(<50%_pleural_line)": 1,
    "b_lines-_severe_(>50%_pleural_line)": 1,
    "b_lines_moderate_50_pleural_line": 1,
    "b_lines_3": 1,
    "b_lines_severe_50_pleural_line": 1,
    "non_a_non_b": 2,
}

B_LINE_RELABEL = {
    "b_lines_<_3": "b_lines",
    "b_lines-_moderate_(<50%_pleural_line)": "b_lines",
    "b_lines-_severe_(>50%_pleural_line)": "b_lines",
}


class ABLineDatasetCreator(DatasetCreator):
    """Reference ``ABLineDatasetCreator`` (ab_line_dataset_creator.py:17-147)."""

    def __init__(self, cfg, database_cfg: Optional[dict] = None, **kw):
        super().__init__(cfg, **kw)
        self.database_cfg = database_cfg

    # ------------------------------------------------------------------
    def mp4_to_images(self, mp4_path: str) -> List[str]:
        """Decompose a masked clip into ``{clip}_{idx}.jpg`` frames
        (reference :27-53)."""
        from ab_line_classifier_tpu.data.video import mp4_to_frames
        return mp4_to_frames(self.cfg["PATHS"]["FRAMES"], mp4_path)

    def build_dataset(self) -> None:
        """Frames table build (reference :55-77)."""
        query_df = pd.read_csv(self.cfg["PATHS"]["CLIPS_TABLE"])
        clip_dfs = []
        masked_root = self.cfg["PATHS"]["MASKED_CLIPS"]
        classes = self.cfg["DATA"]["CLASSES"]
        for _, row in query_df.iterrows():
            pattern = os.path.join(masked_root, str(row["id"]),
                                   f"{row['id']}.mp4")
            for mp4_file in glob.glob(pattern):
                image_paths = self.mp4_to_images(mp4_file)
                clip_dfs.append(pd.DataFrame({
                    "Frame Path": image_paths,
                    "patient_id": row["patient_id"],
                    "Class": row["class"],
                    "Class Name": classes[row["class"]],
                    "id": row["id"],
                }))
        all_clips_df = pd.concat(clip_dfs, axis=0, ignore_index=True)
        all_clips_df.to_csv(self.cfg["PATHS"]["FRAME_TABLE"], index=False)

    # ------------------------------------------------------------------
    @staticmethod
    def label_query_results(df: pd.DataFrame) -> pd.DataFrame:
        """Pure filtering/labeling logic from ``query_to_df`` (reference
        :109-142), split out so it is testable without a database: drop
        homogeneous ('muggle') clips, drop non-A/non-B and unlabeled rows,
        map labels to classes, collapse B-line severities."""
        df = df[df.frame_homogeneity.isnull()]
        df = df[df.a_or_b_lines != "non_a_non_b"]
        df = df[df.a_or_b_lines.notnull()]
        df = df.copy()
        df["class"] = df.a_or_b_lines.map(
            lambda v: LABEL_TO_CLASS_MAP.get(v, -1))
        df["a_or_b_lines"] = df["a_or_b_lines"].replace(B_LINE_RELABEL)
        return df[["patient_id", "a_or_b_lines", "id", "class", "s3_path"]]

    def query_to_df(self) -> pd.DataFrame:
        """SQL query -> labeled clips CSV (reference :79-147). Without
        database credentials, an existing ``QUERY_TABLE`` CSV is used as the
        query result."""
        if self.database_cfg:
            import mysql.connector  # optional dependency

            conn = mysql.connector.connect(
                user=self.database_cfg["USERNAME"],
                password=self.database_cfg["PASSWORD"],
                host=self.database_cfg["HOST"],
                database=self.database_cfg["DATABASE"])
            if conn.is_connected():
                logging.info("Connected to database")
                with open(self.cfg["PATHS"]["DATABASE_QUERY"]) as query_file:
                    df = pd.read_sql(query_file.read(), conn)
            else:
                raise ConnectionError("Couldn't connect to database")
            df.to_csv(self.cfg["PATHS"]["QUERY_TABLE"], index=False)
        else:
            query_table = self.cfg["PATHS"]["QUERY_TABLE"]
            if not os.path.isfile(query_table):
                raise FileNotFoundError(
                    "no database config and no local query table at "
                    f"{query_table!r}")
            logging.info("Using local query table %s", query_table)
            df = pd.read_csv(query_table)

        df = self.label_query_results(df)
        df.to_csv(self.cfg["PATHS"]["CLIPS_TABLE"], index=False)
        return df


if __name__ == "__main__":
    import yaml

    from ab_line_classifier_tpu.config import load_config

    cfg = load_config()
    database_cfg = None
    db_path = os.path.join(os.getcwd(), "database_config.yml")
    if os.path.isfile(db_path):
        with open(db_path) as f:
            database_cfg = yaml.safe_load(f)
    ABLineDatasetCreator(cfg, database_cfg).create_dataset()
