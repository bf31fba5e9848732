"""Experiment tracking utilities (mirror of
`/root/reference/audiotools/ml/experiment.py`): run directories with
generated names and git snapshots for code provenance."""
import datetime
import os
import random
import shlex
import shutil
import subprocess
import typing
from pathlib import Path

# Internal word lists for generated run names (replaces the reference's
# `randomname` dependency, experiment.py:62-74).
_ADJECTIVES = [
    "amber", "brisk", "calm", "deft", "eager", "fuzzy", "gilded", "hazy",
    "icy", "jolly", "keen", "lucid", "mellow", "nimble", "opal", "plucky",
    "quiet", "rapid", "sleek", "tidal", "umber", "vivid", "wry", "zesty",
]
_NOUNS = [
    "aurora", "breeze", "cinder", "delta", "ember", "fjord", "glade",
    "harbor", "inlet", "juniper", "krill", "lagoon", "mesa", "nebula",
    "osprey", "prairie", "quartz", "reef", "summit", "tundra", "umbra",
    "vortex", "willow", "zephyr",
]


class Experiment:
    """Context manager that chdirs into a run directory and can snapshot
    all git-tracked files for exact code provenance
    (reference experiment.py:16-90).

    Parameters
    ----------
    exp_directory : str
        Folder where all experiments are saved, by default "runs/".
    exp_name : str, optional
        Experiment name; defaults to ``<date>-<adjective>-<noun>``.
    """

    def __init__(
        self,
        exp_directory: str = "runs/",
        exp_name: str = None,
    ):
        if exp_name is None:
            exp_name = self.generate_exp_name()
        exp_dir = Path(exp_directory) / exp_name
        exp_dir.mkdir(parents=True, exist_ok=True)

        self.exp_dir = exp_dir
        self.exp_name = exp_name
        try:
            self.git_tracked_files = (
                subprocess.check_output(
                    shlex.split("git ls-tree --full-tree --name-only -r HEAD"),
                    stderr=subprocess.DEVNULL,
                )
                .decode("utf-8")
                .splitlines()
            )
        except subprocess.CalledProcessError:
            self.git_tracked_files = []
        self.parent_directory = Path(".").absolute()

    def __enter__(self):
        self.prev_dir = os.getcwd()
        os.chdir(self.exp_dir)
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        os.chdir(self.prev_dir)

    @staticmethod
    def generate_exp_name():
        """Random experiment name from the date plus an adjective-noun
        pair (reference experiment.py:62-74)."""
        date = datetime.datetime.now().strftime("%y%m%d")
        name = f"{random.choice(_ADJECTIVES)}-{random.choice(_NOUNS)}"
        return f"{date}-{name}"

    def snapshot(self, filter_fn: typing.Callable = lambda f: True):
        """Copy all git-tracked files into the run directory
        (reference experiment.py:76-90)."""
        for f in self.git_tracked_files:
            if filter_fn(f):
                Path(f).parent.mkdir(parents=True, exist_ok=True)
                shutil.copyfile(self.parent_directory / f, f)
