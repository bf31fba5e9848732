"""Dataset preprocessing: CSV manifest creation (mirror of
`/root/reference/audiotools/data/preprocess.py`)."""
import csv
import os
from pathlib import Path

from ..core import AudioSignal


def create_csv(audio_files: list, output_csv: Path, loudness: bool = False, data_path: str = None):
    """Create a CSV of audio files with optional integrated loudness.

    Paths are written relative to ``data_path`` (or the ``PATH_TO_DATA``
    environment variable) so manifests are portable across machines
    (reference preprocess.py:10-81). Empty rows are written for empty
    paths with loudness ``-inf``.
    """
    if data_path is None:
        data_path = Path(os.getenv("PATH_TO_DATA", ""))
    else:
        data_path = Path(data_path)

    fieldnames = ["path"]
    if loudness:
        fieldnames.append("loudness")

    with open(output_csv, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        for af in audio_files:
            row = {}
            af = Path(af)
            if af.name == "":
                # empty row for multitrack syncing (reference
                # preprocess.py:64-67 writes path="" and loudness=-inf)
                row["path"] = ""
                if loudness:
                    row["loudness"] = -float("inf")
                writer.writerow(row)
                continue
            if loudness:
                # the reference measures with ffmpeg's r128 filter
                # (ffmpeg.py:92-114); natively we use the BS.1770 meter
                import numpy as np

                sig = AudioSignal(af)
                row["loudness"] = float(np.asarray(sig.ffmpeg_loudness())[0])
            try:
                row["path"] = str(af.relative_to(data_path))
            except ValueError:
                row["path"] = str(af)
            writer.writerow(row)
    return output_csv
