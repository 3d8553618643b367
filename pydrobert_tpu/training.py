"""Epoch-level training state control: checkpointing, early stopping, LR.

Capability parity with the reference's ``training.py``: the same CSV history
schema (``epoch, es_resume_cd, es_patience_cd, rlr_resume_cd,
rlr_patience_cd, lr, train_met, val_met`` + user entries,
``training.py:275-289``), atomic checkpoint writes (tempfile +
``os.replace``, ``training.py:768-781``), early-stopping and
reduce-on-plateau countdowns (``training.py:849-1072``), best/last epoch
queries, keep-last-and-best checkpoint GC, and multihost metric reduction
(rank-0-only writes).

TPU-native differences:

- Model/optimizer states are **pytrees** (e.g. flax params + optax state),
  serialized with ``flax.serialization`` msgpack; loading requires a
  template pytree of the right structure, so the load methods take and
  return states instead of mutating modules in place.
- The learning rate lives in the optimizer state when built with
  ``optax.inject_hyperparams`` — the controller rewrites
  ``opt_state.hyperparams['learning_rate']`` on reduction and returns the
  updated state. Otherwise it still tracks ``lr`` in the history and the
  user applies it.
- Metric reduction uses ``jax.process_*`` +
  :func:`pydrobert_tpu.parallel.all_reduce_metrics` (mean by default, as the
  reference's pre-divided SUM).
"""

import dataclasses
import math
import os
import tempfile
import warnings
from collections import OrderedDict
from csv import DictReader, writer
from string import Formatter
from typing import Any, Callable, Optional, Set, Tuple

import numpy as np

from .data.params import Parameterized, _field

__all__ = ["TrainingStateController", "TrainingStateParams"]


@dataclasses.dataclass
class TrainingStateParams(Parameterized):
    """Hyperparameters of the training state machine
    (reference ``training.py:38-254``)."""

    num_epochs: Optional[int] = _field(None, bounds=(1, None), softbounds=(10, 100))
    log10_learning_rate: Optional[float] = _field(None, softbounds=(-10, -2))
    early_stopping_threshold: float = _field(0.0, bounds=(0, None), softbounds=(0, 1.0))
    early_stopping_patience: int = _field(1, bounds=(1, None), softbounds=(1, 30))
    early_stopping_burnin: int = _field(0, bounds=(0, None), softbounds=(0, 10))
    reduce_lr_threshold: float = _field(0.0, bounds=(0, None), softbounds=(0, 1.0))
    reduce_lr_factor: float = _field(0.1, softbounds=(0.1, 0.5))
    reduce_lr_patience: int = _field(1, bounds=(1, None), softbounds=(1, 30))
    reduce_lr_cooldown: int = _field(0, bounds=(0, None), softbounds=(0, 10))
    reduce_lr_log10_epsilon: float = _field(-8, bounds=(None, 0))
    reduce_lr_burnin: int = _field(0, bounds=(0, None), softbounds=(0, 10))
    seed: Optional[int] = _field(None)
    keep_last_and_best_only: bool = _field(True)
    saved_model_fmt: str = _field("model_{epoch:03d}.pt")
    saved_optimizer_fmt: str = _field("optim_{epoch:03d}.pt")

    @classmethod
    def get_tunable(cls) -> Set[str]:
        return {
            "num_epochs",
            "log10_learning_rate",
            "early_stopping_threshold",
            "early_stopping_patience",
            "early_stopping_burnin",
            "reduce_lr_threshold",
            "reduce_lr_factor",
            "reduce_lr_patience",
            "reduce_lr_cooldown",
            "reduce_lr_burnin",
        }

    @classmethod
    def _suggest(cls, trial, params, only, prefix):
        # budget-aware sampling in the spirit of the reference
        # (training.py:149-254): patience/burnin are bounded by the epoch
        # budget remaining after one another
        if "num_epochs" in only:
            params.num_epochs = trial.suggest_int(prefix + "num_epochs", 10, 100)
        num_epochs = params.num_epochs if params.num_epochs else 100
        if "log10_learning_rate" in only:
            params.log10_learning_rate = trial.suggest_float(
                prefix + "log10_learning_rate", -10, -2
            )
        if "early_stopping_threshold" in only:
            params.early_stopping_threshold = trial.suggest_float(
                prefix + "early_stopping_threshold", 0.0, 1.0
            )
        if params.early_stopping_threshold:
            if "early_stopping_patience" in only:
                params.early_stopping_patience = trial.suggest_int(
                    prefix + "early_stopping_patience",
                    1,
                    max(1, min(30, num_epochs)),
                )
            if "early_stopping_burnin" in only:
                params.early_stopping_burnin = trial.suggest_int(
                    prefix + "early_stopping_burnin",
                    0,
                    max(0, min(10, num_epochs - params.early_stopping_patience)),
                )
        if "reduce_lr_threshold" in only:
            params.reduce_lr_threshold = trial.suggest_float(
                prefix + "reduce_lr_threshold", 0.0, 1.0
            )
        if params.reduce_lr_threshold:
            if "reduce_lr_factor" in only:
                params.reduce_lr_factor = trial.suggest_float(
                    prefix + "reduce_lr_factor", 0.1, 0.5
                )
            if "reduce_lr_patience" in only:
                params.reduce_lr_patience = trial.suggest_int(
                    prefix + "reduce_lr_patience", 1, max(1, min(30, num_epochs))
                )
            if "reduce_lr_cooldown" in only:
                params.reduce_lr_cooldown = trial.suggest_int(
                    prefix + "reduce_lr_cooldown", 0, 10
                )
            if "reduce_lr_burnin" in only:
                params.reduce_lr_burnin = trial.suggest_int(
                    prefix + "reduce_lr_burnin",
                    0,
                    max(0, min(10, num_epochs - params.reduce_lr_patience)),
                )


def _to_bytes(tree) -> bytes:
    from flax import serialization

    return serialization.to_bytes(tree)


def _from_bytes(template, data: bytes):
    from flax import serialization

    return serialization.from_bytes(template, data)


def _maybe_set_lr(opt_state, lr: float):
    """Write lr into an ``optax.inject_hyperparams`` state, if that's what
    this is; otherwise return the state unchanged (and the caller applies
    the recorded lr itself)."""
    hp = getattr(opt_state, "hyperparams", None)
    if isinstance(hp, dict) and "learning_rate" in hp:
        import jax.numpy as jnp

        hp = dict(hp)
        hp["learning_rate"] = jnp.asarray(
            lr, jnp.result_type(opt_state.hyperparams["learning_rate"])
        )
        return opt_state._replace(hyperparams=hp)
    return opt_state


def _get_lr(opt_state) -> Optional[float]:
    hp = getattr(opt_state, "hyperparams", None)
    if isinstance(hp, dict) and "learning_rate" in hp:
        return float(np.asarray(hp["learning_rate"]))
    return None


class TrainingStateController:
    """Epoch-level experiment state machine (reference
    ``training.py:257-1072``).

    Typical usage::

        controller = TrainingStateController(params, "hist.csv", "states")
        params_, opt_state = controller.load_model_and_optimizer_for_epoch(
            params_, opt_state)
        for _ in range(start_epoch, max_epochs):
            ...  # train epoch, compute train_met/val_met
            cont, opt_state = controller.update_for_epoch(
                params_, opt_state, train_met, val_met)
            if not cont:
                break
    """

    SCIENTIFIC_PRECISION = 5

    def __init__(
        self,
        params: TrainingStateParams,
        state_csv_path: Optional[str] = None,
        state_dir: Optional[str] = None,
        warn: bool = True,
        reduce_op: Optional[str] = None,
        init_fn: Optional[Callable[[Optional[int]], Tuple[Any, Any]]] = None,
    ):
        self.params = params
        if warn:
            for s in (params.saved_model_fmt, params.saved_optimizer_fmt):
                if not any(x[1] == "epoch" for x in Formatter().parse(s)):
                    warnings.warn(
                        f'State format string "{s}" does not contain "epoch" '
                        "field, so is possibly not unique. In this case, only "
                        "the state of the last epoch will persist. To "
                        "suppress this warning, set warn=False"
                    )
        self.state_csv_path = state_csv_path
        self.state_dir = state_dir
        self.cache_hist = dict()
        self.user_entry_types = OrderedDict()
        self.fmt_dict = dict()
        self.reduce_op = reduce_op
        self.init_fn = init_fn
        if params.num_epochs is None:
            self.fmt_dict["epoch"] = "{:010d}"
        else:
            self.fmt_dict["epoch"] = "{{:0{}d}}".format(
                int(math.log10(params.num_epochs)) + 1
            )
        self.fmt_dict["es_resume_cd"] = "{{:0{}d}}".format(
            int(math.log10(max(params.early_stopping_burnin, 1))) + 1
        )
        self.fmt_dict["es_patience_cd"] = "{{:0{}d}}".format(
            int(math.log10(max(params.early_stopping_patience, 1))) + 1
        )
        self.fmt_dict["rlr_resume_cd"] = "{{:0{}d}}".format(
            int(
                math.log10(
                    max(params.reduce_lr_cooldown, params.reduce_lr_burnin, 1)
                )
            )
            + 1
        )
        self.fmt_dict["rlr_patience_cd"] = "{{:0{}d}}".format(
            int(math.log10(max(params.reduce_lr_patience, 1))) + 1
        )
        self.fmt_dict["lr"] = "{{:.{}e}}".format(self.SCIENTIFIC_PRECISION - 1)
        self.fmt_dict["train_met"] = self.fmt_dict["lr"]
        self.fmt_dict["val_met"] = self.fmt_dict["lr"]
        import jax

        self._rank = jax.process_index() if jax.process_count() > 1 else -1
        self.reduced_entries = {"train_met", "val_met"}
        self.update_cache()

    def _barrier(self) -> None:
        if self._rank >= 0:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("pydrobert_tpu_controller")

    def update_cache(self) -> None:
        """(Re)read the history CSV into the in-memory cache."""
        self.cache_hist[0] = {
            "epoch": 0,
            "es_resume_cd": self.params.early_stopping_burnin,
            "es_patience_cd": self.params.early_stopping_patience,
            "rlr_resume_cd": self.params.reduce_lr_burnin,
            "rlr_patience_cd": self.params.reduce_lr_patience,
            "train_met": float("inf"),
            "val_met": float("inf"),
            "lr": None,
        }
        self.cache_hist[0].update(
            (key, None) for key in self.user_entry_types
        )
        if self.params.log10_learning_rate is not None:
            self.cache_hist[0]["lr"] = 10**self.params.log10_learning_rate
        if self.state_csv_path is None:
            return
        self._barrier()
        if not os.path.exists(self.state_csv_path):
            self._barrier()
            return
        with open(self.state_csv_path) as f:
            reader = DictReader(f)
            for row in reader:
                epoch = int(row["epoch"])
                self.cache_hist[epoch] = {
                    "epoch": epoch,
                    "es_resume_cd": int(row["es_resume_cd"]),
                    "es_patience_cd": int(row["es_patience_cd"]),
                    "rlr_resume_cd": int(row["rlr_resume_cd"]),
                    "rlr_patience_cd": int(row["rlr_patience_cd"]),
                    "lr": float(row["lr"]),
                    "train_met": float(row["train_met"]),
                    "val_met": float(row["val_met"]),
                }
                for name, type_ in self.user_entry_types.items():
                    self.cache_hist[epoch][name] = type_(row[name])
        self._barrier()

    def add_entry(
        self, name: str, typ: type = str, fmt: str = "{}", reduce: bool = False
    ) -> None:
        """Register a user-defined per-epoch history column (reference
        ``training.py:476-543``). Must be called before the first
        :func:`update_for_epoch`."""
        if name in {
            "epoch",
            "es_resume_cd",
            "es_patience_cd",
            "rlr_resume_cd",
            "rlr_patience_cd",
            "lr",
            "train_met",
            "val_met",
        }:
            raise ValueError(f'"{name}" is a reserved entry name')
        if not isinstance(typ, type):
            raise ValueError(f"typ ({typ}) must be a type")
        self.user_entry_types[name] = typ
        self.fmt_dict[name] = fmt
        if reduce:
            self.reduced_entries.add(name)
        self.update_cache()

    def get_last_epoch(self) -> int:
        return max(self.cache_hist)

    def get_best_epoch(self, train_met: bool = False) -> int:
        """Epoch with the lowest recorded validation (or training) metric;
        ties go to the earlier epoch."""
        ent = "train_met" if train_met else "val_met"
        fmt = self.fmt_dict[ent]
        min_epoch = 0
        min_met = float(fmt.format(self.cache_hist[0][ent]))
        for info in self.cache_hist.values():
            cur = float(fmt.format(info[ent]))
            if cur < min_met:
                min_epoch = info["epoch"]
                min_met = cur
        return min_epoch

    def get_info(self, epoch: int, *default) -> dict:
        return self.cache_hist.get(epoch, *default)

    def __getitem__(self, epoch: int) -> dict:
        return self.get_info(epoch)

    def get_model_path_with_info(self, info: dict) -> str:
        return os.path.join(
            self.state_dir, self.params.saved_model_fmt.format(**info)
        )

    def get_optimizer_path_with_info(self, info: dict) -> str:
        return os.path.join(
            self.state_dir, self.params.saved_optimizer_fmt.format(**info)
        )

    def load_model_for_epoch(self, model_state, epoch: Optional[int] = None):
        """Return the model state for `epoch` (best epoch when unset;
        re-initialized via `init_fn` when 0). `model_state` is the template
        pytree (and the fallback when nothing can be loaded)."""
        self._barrier()
        if epoch is None:
            epoch = self.get_best_epoch()
        if not epoch:
            if self.init_fn is not None:
                model_state = self.init_fn(self.params.seed)[0]
            else:
                warnings.warn(
                    "no init_fn given, so cannot re-initialize states for "
                    "epoch 0"
                )
        elif self.state_dir is not None:
            pth = self.get_model_path_with_info(self.get_info(epoch))
            with open(pth, "rb") as f:
                model_state = _from_bytes(model_state, f.read())
        else:
            warnings.warn(
                f"Unable to load model for epoch {epoch}. No state directory!"
            )
        self._barrier()
        return model_state

    def load_model_and_optimizer_for_epoch(
        self, model_state, opt_state, epoch: Optional[int] = None
    ):
        """Return ``(model_state, opt_state)`` for `epoch` (last epoch when
        unset; re-initialized when 0)."""
        self._barrier()
        if epoch is None:
            epoch = self.get_last_epoch()
        if not epoch:
            if self.init_fn is not None:
                model_state, opt_state = self.init_fn(self.params.seed)
            else:
                warnings.warn(
                    "no init_fn given, so cannot re-initialize states for "
                    "epoch 0"
                )
            if self.params.log10_learning_rate is not None:
                opt_state = _maybe_set_lr(
                    opt_state, 10**self.params.log10_learning_rate
                )
        elif self.state_dir is not None:
            info = self.get_info(epoch)
            with open(self.get_model_path_with_info(info), "rb") as f:
                model_state = _from_bytes(model_state, f.read())
            with open(self.get_optimizer_path_with_info(info), "rb") as f:
                opt_state = _from_bytes(opt_state, f.read())
        else:
            warnings.warn(
                f"Unable to load model and optimizer for epoch {epoch}. "
                "No state directory!"
            )
        self._barrier()
        return model_state, opt_state

    def delete_model_and_optimizer_for_epoch(self, epoch: int) -> None:
        if self.state_dir is None:
            return
        info = self.get_info(epoch, None)
        if info is None:
            return
        self._clean_up_files(
            self.get_model_path_with_info(info),
            self.get_optimizer_path_with_info(info),
        )

    def _clean_up_files(self, *paths) -> None:
        if self._rank <= 0:
            for path in paths:
                try:
                    os.remove(path)
                except OSError:
                    pass

    def save_model_and_optimizer_with_info(
        self, model_state, opt_state, info: dict
    ) -> None:
        """Atomically serialize both states (tempfile + ``os.replace``),
        rank 0 only."""
        if self.state_dir is None:
            return
        if self._rank <= 0:
            write_pairs = (
                (model_state, self.get_model_path_with_info(info)),
                (opt_state, self.get_optimizer_path_with_info(info)),
            )
            replaces = []
            for obj, path in write_pairs:
                dir_ = os.path.dirname(path)
                os.makedirs(dir_, exist_ok=True)
                with tempfile.NamedTemporaryFile(
                    "wb", dir=dir_, delete=False
                ) as f:
                    f.write(_to_bytes(obj))
                    replaces.append((f.name, path))
            for src, dst in replaces:
                os.replace(src, dst)

    def save_info_to_hist(self, info: dict) -> None:
        """Append an epoch row to the CSV history (rank 0 only)."""
        self.cache_hist[info["epoch"]] = info
        if self.state_csv_path is None:
            return
        if self._rank <= 0:
            names = [
                "epoch",
                "es_resume_cd",
                "es_patience_cd",
                "rlr_resume_cd",
                "rlr_patience_cd",
                "lr",
                "train_met",
                "val_met",
            ]
            names += list(self.user_entry_types)
            write_header = not os.path.exists(self.state_csv_path)
            with open(self.state_csv_path, "a") as f:
                wr = writer(f)
                if write_header:
                    wr.writerow(names)
                wr.writerow([self.fmt_dict[k].format(info[k]) for k in names])

    def continue_training(self, epoch: Optional[int] = None) -> bool:
        """Whether training should continue after `epoch` (last if unset)."""
        if epoch is None:
            epoch = self.get_last_epoch()
        info = self.get_info(epoch)
        if not self.params.num_epochs:
            cont = True
        else:
            cont = epoch < self.params.num_epochs
        if self.params.early_stopping_threshold and not info["es_patience_cd"]:
            cont = False
        return cont

    def update_for_epoch(
        self,
        model_state,
        opt_state,
        train_met: float,
        val_met: float,
        epoch: Optional[int] = None,
        best_is_train: bool = False,
        **kwargs,
    ) -> Tuple[bool, Any]:
        """Update history/countdowns after an epoch; checkpoint; return
        ``(cont, opt_state)`` (the state carries a reduced lr when this
        epoch triggered a reduction and the optimizer exposes hyperparams).
        """
        if self._rank >= 0:
            from .parallel import all_reduce_metrics

            kwargs["train_met"] = float(train_met)
            kwargs["val_met"] = float(val_met)
            reduced = {
                k: float(kwargs[k]) for k in sorted(self.reduced_entries)
            }
            reduced = all_reduce_metrics(reduced, self.reduce_op or "mean")
            kwargs.update(reduced)
            train_met = kwargs.pop("train_met")
            val_met = kwargs.pop("val_met")
        train_met, val_met = float(train_met), float(val_met)
        if epoch is None:
            epoch = self.get_last_epoch() + 1
        last_best = self.get_best_epoch(best_is_train)
        if not self.params.num_epochs:
            cont = True
        else:
            cont = epoch < self.params.num_epochs
            if epoch > self.params.num_epochs:
                warnings.warn(
                    "Training is continuing, despite passing num_epochs"
                )
        info = self.get_info(epoch - 1, None)
        if info is None:
            raise ValueError(
                f"no entry for the previous epoch {epoch}, so unable to update"
            )
        info = dict(info)
        for key, value in kwargs.items():
            if key not in self.user_entry_types:
                raise TypeError(
                    "update_for_epoch() got an unexpected keyword argument "
                    f"'{key}' (did you forget to add_entry()?)"
                )
            elif not isinstance(value, self.user_entry_types[key]):
                raise ValueError(
                    f'keyword argument "{key}" value is not of type '
                    f"{self.user_entry_types[key]}"
                )
            info[key] = value
        remaining = set(self.user_entry_types) - set(kwargs)
        if remaining:
            raise TypeError(
                "The following keyword arguments were not provided as keyword"
                " arguments but were specified via add_entry(): "
                f"{sorted(remaining)}"
            )
        if info["lr"] is None:
            lr = _get_lr(opt_state)
            # when the optimizer state carries no lr (no inject_hyperparams)
            # and log10_learning_rate is unset, track a RELATIVE scale
            # starting at 1.0 so reduce-on-plateau still counts down and the
            # history records the cumulative factor (0.0 would make
            # old_lr - new_lr vanish and silently disable reductions; the
            # reference reads optimizer.defaults['lr'], which functional
            # optax has no analogue of)
            info["lr"] = 1.0 if lr is None else lr
        es_epoch = (
            epoch
            - self.params.early_stopping_patience
            + info["es_patience_cd"]
            - 1
        )
        es_info = self.get_info(es_epoch)
        if info["es_resume_cd"]:
            info["es_resume_cd"] -= 1
        elif (
            max(es_info["val_met"] - val_met, 0)
            < self.params.early_stopping_threshold
        ):
            info["es_patience_cd"] -= 1
            if info["es_patience_cd"] < 0:
                warnings.warn(
                    "Early stopping criterion was already met, but training "
                    "has continued"
                )
                info["es_patience_cd"] = 0
        else:
            info["es_patience_cd"] = self.params.early_stopping_patience
        if self.params.early_stopping_threshold and not info["es_patience_cd"]:
            cont = False
        rlr_epoch = (
            epoch - self.params.reduce_lr_patience + info["rlr_patience_cd"] - 1
        )
        rlr_info = self.get_info(rlr_epoch)
        if info["rlr_resume_cd"]:
            info["rlr_resume_cd"] -= 1
        elif (
            max(rlr_info["val_met"] - val_met, 0)
            < self.params.reduce_lr_threshold
        ):
            info["rlr_patience_cd"] -= 1
            if not info["rlr_patience_cd"]:
                old_lr = info["lr"]
                new_lr = old_lr * self.params.reduce_lr_factor
                rlr_epsilon = 10**self.params.reduce_lr_log10_epsilon
                if old_lr - new_lr > rlr_epsilon:
                    info["lr"] = new_lr
                    opt_state = _maybe_set_lr(opt_state, new_lr)
                info["rlr_resume_cd"] = self.params.reduce_lr_cooldown
                info["rlr_patience_cd"] = self.params.reduce_lr_patience
        else:
            info["rlr_patience_cd"] = self.params.reduce_lr_patience
        info["epoch"] = epoch
        info["val_met"] = val_met
        info["train_met"] = train_met
        if self.state_dir is not None:
            model_pth = self.get_model_path_with_info(info)
            optim_pth = self.get_optimizer_path_with_info(info)
            wrote_info_warn = (
                f"Saving epoch {epoch} model and optimizer failed but write "
                f"to '{self.state_csv_path}' succeeded. You should delete "
                "that entry."
            )
            if self.params.keep_last_and_best_only:
                self.cache_hist[epoch] = info
                cur_best = self.get_best_epoch(best_is_train)
                if cur_best != epoch:
                    best_info = self.get_info(cur_best)
                    if model_pth == self.get_model_path_with_info(best_info):
                        raise ValueError(
                            f"New model checkpoint '{model_pth}' would "
                            "overwrite best model checkpoint, so we raised "
                            "instead. Either change the model format string "
                            "or set keep_last_and_best_only to False"
                        )
                    if optim_pth == self.get_optimizer_path_with_info(
                        best_info
                    ):
                        raise ValueError(
                            f"New optimizer checkpoint '{optim_pth}' would "
                            "overwrite best optimizer checkpoint, so we "
                            "raised instead. Either change the optimizer "
                            "format string or set keep_last_and_best_only to "
                            "False"
                        )
                if cur_best == epoch - 1:
                    self.save_model_and_optimizer_with_info(
                        model_state, opt_state, info
                    )
                    self.save_info_to_hist(info)
                else:
                    last_info = self.get_info(epoch - 1)
                    last_paths = {
                        self.get_model_path_with_info(last_info),
                        self.get_optimizer_path_with_info(last_info),
                    }
                    last_best_info = self.get_info(last_best)
                    last_best_paths = {
                        self.get_model_path_with_info(last_best_info),
                        self.get_optimizer_path_with_info(last_best_info),
                    }
                    save_info_first = {model_pth, optim_pth} & (
                        last_paths | last_best_paths
                    )
                    if save_info_first:
                        self.save_info_to_hist(info)
                    try:
                        self.save_model_and_optimizer_with_info(
                            model_state, opt_state, info
                        )
                    except Exception:
                        if (
                            self._rank <= 0
                            and save_info_first
                            and self.state_csv_path
                        ):
                            warnings.warn(wrote_info_warn)
                        raise
                    if not save_info_first:
                        self.save_info_to_hist(info)
                    clean_up = set(last_paths)
                    if last_best != cur_best:
                        clean_up |= last_best_paths
                    clean_up -= {model_pth, optim_pth}
                    self._clean_up_files(*clean_up)
            else:
                save_info_first = os.path.exists(model_pth) or os.path.exists(
                    optim_pth
                )
                if save_info_first:
                    self.save_info_to_hist(info)
                try:
                    self.save_model_and_optimizer_with_info(
                        model_state, opt_state, info
                    )
                except Exception:
                    if (
                        self._rank <= 0
                        and save_info_first
                        and self.state_csv_path
                    ):
                        warnings.warn(wrote_info_warn)
                    raise
                if not save_info_first:
                    self.save_info_to_hist(info)
        else:
            self.save_info_to_hist(info)
        return cont, opt_state
