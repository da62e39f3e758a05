"""Retrospective dataset creation: the abstract ETL pipeline.

Reference ``src/data/dataset_creator.py``: ``create_dataset()`` chains
``query_to_df -> database_pull -> auto_mask -> build_dataset``; the base
class owns the S3 clip pull and auto-masking stages, subclasses supply the
query and the final table build.

Differences from the reference: downloads use stdlib ``urllib`` (the
reference uses the unmaintained ``wget`` package) behind a swappable
``fetch_fn`` so the pipeline is testable without network access, and
auto-masking drives the batched/jitted ``UnetSegmentation``.
"""

from __future__ import annotations

import logging
import os
import urllib.error
import urllib.request
from abc import ABC, abstractmethod
from typing import Callable, Dict, Optional

import pandas as pd

from ab_line_classifier_tpu.data.auto_masking import UnetSegmentation

logging.basicConfig(format="[%(levelname)s] %(message)s", level=logging.INFO)


def _default_fetch(url: str, out_path: str) -> None:
    urllib.request.urlretrieve(url, out_path)


class DatasetCreator(ABC):
    """Abstract base automating retrospective dataset creation
    (reference dataset_creator.py:17-42)."""

    def __init__(self, cfg, fetch_fn: Optional[Callable[[str, str], None]] = None):
        self.cfg = cfg
        self.fetch_fn = fetch_fn or _default_fetch

    def create_dataset(self) -> None:
        logging.info("Running query to df process...")
        self.query_to_df()
        logging.info("Running database pull process...")
        self.database_pull()
        logging.info("Running auto-masking process...")
        self.auto_mask()
        logging.info("Performing final dataset build...")
        self.build_dataset()

    @abstractmethod
    def query_to_df(self) -> pd.DataFrame:
        ...

    @abstractmethod
    def build_dataset(self) -> None:
        ...

    def database_pull(self) -> None:
        """Pull raw clips from object storage via the clips table's
        ``s3_path`` links (reference dataset_creator.py:44-84): downloads
        ``{id}.mp4`` per row, counting HTTP errors instead of aborting."""
        output_folder = self.cfg["PATHS"]["RAW_CLIPS"]
        df = pd.read_csv(self.cfg["PATHS"]["CLIPS_TABLE"])
        os.makedirs(output_folder, exist_ok=True)

        links = df.s3_path
        clip_ids = df.id
        assert len(links) == len(clip_ids)

        logging.info("Fetching clips...")
        warning_counts: Dict[str, int] = {}
        for link, clip_id in zip(links, clip_ids):
            # Fetch to a .part name and rename on success: urlretrieve
            # (unlike the reference's wget, which stages to a tmp file)
            # writes the destination in place, so a mid-transfer failure
            # would otherwise leave a truncated {id}.mp4 that a later
            # auto_mask/build run ingests as a valid clip. URLError covers
            # HTTPError AND connection resets / ContentTooShortError —
            # catching HTTPError alone aborts the whole pull on the first
            # network blip instead of counting it as promised.
            dest = os.path.join(output_folder, f"{clip_id}.mp4")
            part = dest + ".part"
            try:
                self.fetch_fn(link, part)
                os.replace(part, dest)
            except urllib.error.URLError as e:
                if os.path.exists(part):
                    os.remove(part)
                key = str(e)
                warning_counts[key] = warning_counts.get(key, 0) + 1
        logging.info("Fetched clips successfully!")
        for k, v in warning_counts.items():
            logging.warning("%s occurred %d times", k, v)

    def auto_mask(self) -> None:
        """Reference dataset_creator.py:86-95. The model path goes to
        ``predict`` only (the reference API's load site) — passing it to
        the constructor too would import the h5/checkpoint twice."""
        unet_seg = UnetSegmentation()
        unet_seg.predict(
            input_paths=self.cfg["PATHS"]["RAW_CLIPS"],
            output_path=self.cfg["PATHS"]["MASKED_CLIPS"],
            model_path=self.cfg["PATHS"]["AUTOMASK_MODEL_PATH"],
            output_format=self.cfg["DATA"]["AUTOMASK"]["OUTPUT_FORMAT"],
            edge_preserve=self.cfg["DATA"]["AUTOMASK"]["EDGE_PRESERVE"],
            save_cropped_roi=self.cfg["DATA"]["AUTOMASK"]["SAVE_CROPPED_ROI"],
        )
