"""Checkpoint/resume for training state (SURVEY.md §5.4).

The reference composes three pieces: BaseModel.save_to_folder with
``extra_data`` (optimizer state), Tracker.state_dict (metric history +
step), and the resumable sampler's ``start_idx``
(/root/reference/audiotools/ml/layers/base.py:237-328,
ml/decorators.py:413-440, data/datasets.py:490-503). ``Checkpointer``
bundles all three on orbax — async-capable, sharding-aware TPU
checkpointing — with a retention policy.
"""
import pickle
from pathlib import Path

import jax
import numpy as np

__all__ = ["Checkpointer"]


class Checkpointer:
    """Save/restore (params, opt_state, tracker, data position) bundles.

    Parameters
    ----------
    directory : str
        Root folder for checkpoints (one subfolder per step).
    max_to_keep : int, optional
        Retention count, by default 5.
    """

    def __init__(self, directory, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        params,
        opt_state=None,
        tracker=None,
        data_idx: int = None,
        extra: dict = None,
    ):
        """Checkpoint a training state bundle at ``step``."""
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        self.manager.save(
            step, args=self._ocp.args.StandardSave(state)
        )
        # host-side metadata rides alongside
        meta = {
            "step": step,
            "data_idx": data_idx,
            "tracker": tracker.state_dict() if tracker is not None else None,
            "extra": extra or {},
        }
        self.manager.wait_until_finished()
        step_dir = self.directory / str(step)
        with open(step_dir / "host_state.pkl", "wb") as f:
            pickle.dump(meta, f)
        return step_dir

    def latest_step(self):
        return self.manager.latest_step()

    def restore(self, step: int = None, template=None):
        """Restore a bundle; ``template`` is a pytree with the target
        structure/shardings (e.g. ``{"params": params, "opt_state": ...}``).

        Returns
        -------
        (state, meta) : the restored pytree and the host metadata dict.
        """
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if template is not None:
            state = self.manager.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        else:
            state = self.manager.restore(step)
        meta_path = self.directory / str(step) / "host_state.pkl"
        meta = {}
        if meta_path.exists():
            with open(meta_path, "rb") as f:
                meta = pickle.load(f)
        return state, meta

    def close(self):
        self.manager.close()
