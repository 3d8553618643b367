"""AOT serving artifacts: compile a recognizer once, serialize, serve.

The reference's deployment story is TorchScript: ``config.USE_JIT``
(reference ``config.py:70-77``) makes ``_compat.script``
(``_compat.py:185-193``) compile every functional so a scripted module can
be saved and executed in a runtime without the Python class definitions.
The XLA-native equivalent is :mod:`jax.export`: trace + lower a jitted
function to a StableHLO module, serialize the module to bytes, and reload
it later — in a process that needs neither the model code nor flax — where
``Exported.call`` compiles for the local backend.

An **artifact** is a directory:

- ``meta.json``        — schema version, entry name, target platforms,
                         per-specialization input signatures, padding and
                         output-batch-axis metadata
- ``params.npz``       — model parameters flattened by ``/``-joined path
- ``<entry>_<k>.bin``  — one serialized StableHLO module per input-shape
                         specialization (XLA shapes are static; the loader
                         picks a specialization by shape at call time and
                         can zero-pad inputs up to the next available one)

Artifacts are **multi-platform** by default (``platforms=("cpu", "tpu")``):
a CPU host can build, test, and ship the exact module a TPU server runs.
Pallas kernels are platform-specific, so the exporter traces with the
kernels gated off unless ``allow_pallas=True`` (then the artifact is
TPU-only and must be exported with ``platforms=("tpu",)``).

High-level entry points build the common serving heads from a model
checkpoint: :func:`export_ctc_recognizer` (greedy or width-``W`` prefix
search, optional shallow-fusion LM) and :func:`export_transducer_recognizer`
(greedy or time-synchronous beam). Both emit batch-major outputs and
accept several batch/length specializations in one artifact.
"""

import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as _jax_export
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from . import config

__all__ = [
    "ServingArtifact",
    "export_ctc_recognizer",
    "export_transducer_recognizer",
    "flatten_arrays",
    "unflatten_arrays",
]

_META_NAME = "meta.json"
_PARAMS_NAME = "params.npz"
_VERSION = 1


def _flatten_dict(tree: Dict[str, Any], _prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, val in tree.items():
        key = str(key)
        if "/" in key:
            raise ValueError(f"key {key!r} contains '/'")
        path = _prefix + key
        if isinstance(val, dict):
            out.update(_flatten_dict(val, path + "/"))
        else:
            out[path] = val
    return out


def flatten_arrays(tree: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flatten a nested dict-of-arrays into ``{'a/b/c': array}``.

    The inverse of :func:`unflatten_arrays`. Keys must not contain ``/``.
    """
    return {k: np.asarray(v) for k, v in _flatten_dict(tree).items()}


def unflatten_arrays(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Rebuild the nested dict flattened by :func:`flatten_arrays`."""
    out: Dict[str, Any] = {}
    for path, val in flat.items():
        parts = path.split("/")
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return out


def _sig_entry(x) -> Dict[str, Any]:
    return {"shape": list(x.shape), "dtype": str(np.dtype(x.dtype))}


def _spec_to_json(spec: PartitionSpec) -> List[Any]:
    return [
        None if e is None else (e if isinstance(e, str) else list(e))
        for e in spec
    ]


def _spec_from_json(entries: Sequence[Any]) -> PartitionSpec:
    return PartitionSpec(
        *(
            None if e is None else (e if isinstance(e, str) else tuple(e))
            for e in entries
        )
    )


def _is_spec(x) -> bool:
    return isinstance(x, PartitionSpec)


class _NoPallas:
    """Gate Pallas kernels off for the duration of a trace.

    Multi-platform StableHLO must not contain platform-specific custom
    calls; the kernel gates are plain Python reads of ``config`` at trace
    time, so flipping them here keeps the traced module pure XLA.
    """

    def __enter__(self):
        self._saved = (
            config.USE_PALLAS,
            config.USE_PALLAS_BEAM,
            config.USE_PALLAS_TOPM,
        )
        config.USE_PALLAS = False
        config.USE_PALLAS_BEAM = "0"
        config.USE_PALLAS_TOPM = "0"
        return self

    def __exit__(self, *exc):
        (
            config.USE_PALLAS,
            config.USE_PALLAS_BEAM,
            config.USE_PALLAS_TOPM,
        ) = self._saved
        return False


class ServingArtifact:
    """A loaded serving artifact: ``artifact(*inputs)`` runs the module.

    Call inputs are matched against the exported specializations by shape;
    when no exact match exists, each paddable axis (recorded at export) is
    zero-padded up to the smallest specialization that fits and batch-major
    outputs are sliced back to the caller's batch size.
    """

    def __init__(self, meta: Dict[str, Any], params: Dict[str, Any],
                 modules: List[bytes]):
        self.meta = meta
        self.params = params
        self._blobs = modules
        self._compiled: Dict[int, Callable] = {}
        self._mesh: Optional[Mesh] = None
        self._placed_params: Optional[Any] = None

    # -- construction -------------------------------------------------

    @staticmethod
    def export(
        path: str,
        fn: Callable,
        params: Dict[str, Any],
        specs: Sequence[Tuple],
        *,
        entry: str = "recognize",
        platforms: Sequence[str] = ("cpu", "tpu"),
        allow_pallas: bool = False,
        paddable: Optional[Sequence[Sequence[int]]] = None,
        output_batch_axis: Optional[int] = 0,
        extra_meta: Optional[Dict[str, Any]] = None,
        mesh: Optional[Mesh] = None,
        param_specs: Optional[Any] = None,
        input_specs: Optional[Sequence[PartitionSpec]] = None,
    ) -> "ServingArtifact":
        """Trace ``fn(params, *inputs)`` at every spec and write `path`.

        `specs` is a sequence of example input tuples (arrays or
        ``jax.ShapeDtypeStruct``). `paddable`, when given, lists for each
        input the axes the loader may zero-pad to reach a larger
        specialization; `output_batch_axis` (or ``None``) tells the loader
        which output axis to slice back after batch padding.

        **Multi-chip artifacts**: pass `mesh` together with `param_specs`
        (a pytree of ``PartitionSpec`` congruent with `params`, e.g. from
        :func:`pydrobert_tpu.parallel.param_partition_specs`) and
        `input_specs` (one ``PartitionSpec`` per input). The module is
        traced with those shardings baked in — XLA inserts the collectives
        — and the loader rebuilds a same-shape mesh over the serving
        host's devices (which must number at least the mesh size).
        """
        if allow_pallas and "cpu" in platforms:
            raise ValueError(
                "allow_pallas=True artifacts are TPU-only; export with "
                "platforms=('tpu',)"
            )
        if not specs:
            raise ValueError("need at least one input specialization")
        if mesh is not None:
            if param_specs is None or input_specs is None:
                raise ValueError(
                    "mesh exports need param_specs and input_specs"
                )
            param_shardings = jax.tree.map(
                lambda s: NamedSharding(mesh, s), param_specs,
                is_leaf=_is_spec,
            )
            in_shardings = (
                param_shardings,
                *(NamedSharding(mesh, s) for s in input_specs),
            )
            jit_fn = jax.jit(fn, in_shardings=in_shardings)
        else:
            jit_fn = jax.jit(fn)
        blobs: List[bytes] = []
        sigs: List[List[Dict[str, Any]]] = []
        for spec in specs:
            spec = tuple(
                jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
                if not isinstance(x, jax.ShapeDtypeStruct)
                else x
                for x in spec
            )
            if allow_pallas:
                exp = _jax_export.export(jit_fn, platforms=list(platforms))(
                    params, *spec
                )
            else:
                with _NoPallas():
                    exp = _jax_export.export(
                        jit_fn, platforms=list(platforms)
                    )(params, *spec)
            blobs.append(bytes(exp.serialize()))
            sigs.append([_sig_entry(x) for x in spec])
        meta = {
            "version": _VERSION,
            "entry": entry,
            "platforms": list(platforms),
            "specs": sigs,
            "paddable": (
                list(map(list, paddable)) if paddable is not None else None
            ),
            "output_batch_axis": output_batch_axis,
        }
        if mesh is not None:
            meta["mesh"] = {
                "axis_names": list(mesh.axis_names),
                "shape": [int(mesh.shape[a]) for a in mesh.axis_names],
            }
            meta["param_specs"] = {
                k: _spec_to_json(v)
                for k, v in _flatten_dict(param_specs).items()
            }
            meta["input_specs"] = [_spec_to_json(s) for s in input_specs]
        if extra_meta:
            meta["extra"] = extra_meta
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, _META_NAME), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
        np.savez(os.path.join(path, _PARAMS_NAME), **flatten_arrays(params))
        for k, blob in enumerate(blobs):
            with open(os.path.join(path, f"{entry}_{k}.bin"), "wb") as f:
                f.write(blob)
        return ServingArtifact(meta, params, blobs)

    @staticmethod
    def load(path: str) -> "ServingArtifact":
        """Read an artifact directory; no model code is required."""
        with open(os.path.join(path, _META_NAME)) as f:
            meta = json.load(f)
        if meta.get("version") != _VERSION:
            raise ValueError(
                f"artifact version {meta.get('version')} != {_VERSION}"
            )
        with np.load(os.path.join(path, _PARAMS_NAME)) as z:
            params = unflatten_arrays({k: z[k] for k in z.files})
        blobs = []
        for k in range(len(meta["specs"])):
            with open(
                os.path.join(path, f"{meta['entry']}_{k}.bin"), "rb"
            ) as f:
                blobs.append(f.read())
        return ServingArtifact(meta, params, blobs)

    # -- dispatch ------------------------------------------------------

    def _fits(self, sig: List[Dict[str, Any]], inputs: Sequence) -> bool:
        """Exact dtype match; shapes equal or paddable up to the sig."""
        paddable = self.meta.get("paddable")
        for i, (entry, x) in enumerate(zip(sig, inputs)):
            if str(np.asarray(x).dtype) != entry["dtype"]:
                return False
            want = entry["shape"]
            have = list(np.shape(x))
            if len(want) != len(have):
                return False
            axes = set(paddable[i]) if paddable is not None else set()
            for ax, (w, h) in enumerate(zip(want, have)):
                if h == w:
                    continue
                if h < w and ax in axes:
                    continue
                return False
        return True

    def _cost(self, sig: List[Dict[str, Any]]) -> int:
        return int(
            sum(int(np.prod(entry["shape"])) for entry in sig)
        )

    def _ensure_mesh(self) -> Mesh:
        """(Re)build the export-time mesh over this host's devices."""
        if self._mesh is None:
            info = self.meta["mesh"]
            shape = tuple(info["shape"])
            n = int(np.prod(shape))
            devices = jax.devices()
            if len(devices) < n:
                raise RuntimeError(
                    f"artifact was exported for a {shape} mesh "
                    f"({n} devices); this host has {len(devices)}"
                )
            self._mesh = Mesh(
                np.asarray(devices[:n]).reshape(shape),
                tuple(info["axis_names"]),
            )
        return self._mesh

    def _mesh_params(self) -> Any:
        """Parameters placed on the mesh per the exported specs, once."""
        if self._placed_params is None:
            mesh = self._ensure_mesh()
            specs = unflatten_arrays(
                {
                    k: _spec_from_json(v)
                    for k, v in self.meta["param_specs"].items()
                }
            )
            self._placed_params = jax.tree.map(
                lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
                self.params,
                specs,
                is_leaf=_is_spec,
            )
        return self._placed_params

    def _call_k(self, k: int) -> Callable:
        fn = self._compiled.get(k)
        if fn is None:
            exp = _jax_export.deserialize(bytearray(self._blobs[k]))
            fn = self._compiled[k] = jax.jit(exp.call)
        return fn

    def __call__(self, *inputs):
        if len(inputs) != len(self.meta["specs"][0]):
            raise TypeError(
                f"expected {len(self.meta['specs'][0])} inputs, got "
                f"{len(inputs)}"
            )
        candidates = [
            k
            for k, sig in enumerate(self.meta["specs"])
            if self._fits(sig, inputs)
        ]
        if not candidates:
            avail = [
                [tuple(e["shape"]) for e in sig] for sig in self.meta["specs"]
            ]
            raise ValueError(
                f"no exported specialization fits input shapes "
                f"{[np.shape(x) for x in inputs]}; available: {avail}"
            )
        k = min(candidates, key=lambda k: self._cost(self.meta["specs"][k]))
        sig = self.meta["specs"][k]
        batch_in = int(np.shape(inputs[0])[0]) if np.shape(inputs[0]) else 0
        padded = []
        for entry, x in zip(sig, inputs):
            x = np.asarray(x)
            widths = [
                (0, w - h) for w, h in zip(entry["shape"], x.shape)
            ]
            if any(hi for _, hi in widths):
                x = np.pad(x, widths)
            padded.append(x)
        if self.meta.get("mesh"):
            mesh = self._ensure_mesh()
            padded = [
                jax.device_put(
                    x,
                    NamedSharding(mesh, _spec_from_json(spec_json)),
                )
                for x, spec_json in zip(padded, self.meta["input_specs"])
            ]
            out = self._call_k(k)(self._mesh_params(), *padded)
        else:
            out = self._call_k(k)(self.params, *padded)
        bax = self.meta.get("output_batch_axis")
        if bax is None or batch_in == sig[0]["shape"][0]:
            return out

        def _slice(y):
            if y.ndim > bax and y.shape[bax] == sig[0]["shape"][0]:
                return jax.lax.slice_in_dim(y, 0, batch_in, axis=bax)
            return y

        return jax.tree.map(_slice, out)


def _mesh_kwargs(
    mesh: Optional[Mesh], partition_rules: Optional[Callable], params
) -> Dict[str, Any]:
    """Mesh/sharding kwargs for :meth:`ServingArtifact.export`.

    Batch inputs (feats, lens) shard over the ``data`` axis; params get
    the effective specs from `partition_rules` (with
    :func:`~pydrobert_tpu.parallel.shard_params`'s divisibility
    fallback).
    """
    if mesh is None:
        return {}
    if partition_rules is None:
        raise ValueError("mesh exports need partition_rules")
    from .parallel import DATA_AXIS, param_partition_specs

    return {
        "mesh": mesh,
        "param_specs": param_partition_specs(params, mesh, partition_rules),
        "input_specs": [
            PartitionSpec(DATA_AXIS),
            PartitionSpec(DATA_AXIS),
        ],
    }


def export_ctc_recognizer(
    path: str,
    model,
    params: Dict[str, Any],
    *,
    specs: Sequence[Tuple[int, int]],
    width: Optional[int] = None,
    lm=None,
    beta: float = 0.2,
    platforms: Sequence[str] = ("cpu", "tpu"),
    mesh: Optional[Mesh] = None,
    partition_rules: Optional[Callable] = None,
) -> ServingArtifact:
    """Export a CTC ASR serving head: ``artifact(feats, lens)``.

    `specs` lists ``(batch, max_frames)`` specializations. With `width`
    ``None`` the head is greedy (outputs ``hyps (N, S)``, ``lens (N,)``);
    otherwise a width-`width` CTC prefix search (outputs batch-major
    ``hyps (N, W, S)``, ``lens (N, W)``, ``log_probs (N, W)``), optionally
    shallow-fused with `lm` at weight `beta`.

    Passing `mesh` + `partition_rules` (e.g.
    :func:`~pydrobert_tpu.models.conformer_partition_rules`) exports a
    multi-chip artifact: params shard per the rules, batches shard over
    the ``data`` axis, and the loader rebuilds the mesh at serving time.
    """
    from .ops.decoding import CTCPrefixSearch, ctc_greedy_search

    mesh_kw = _mesh_kwargs(mesh, partition_rules, params)

    num_filts = model.cfg.num_filts
    if width is None:

        def fn(params, feats, lens):
            logits, out_lens = model.apply({"params": params}, feats, lens)
            _, hyps, hyp_lens = ctc_greedy_search(
                logits, out_lens, batch_first=True
            )
            return hyps, hyp_lens

    else:
        search = CTCPrefixSearch(width, beta=beta, lm=lm)

        def fn(params, feats, lens):
            logits, out_lens = model.apply({"params": params}, feats, lens)
            y, y_lens, y_probs = search(
                jnp.swapaxes(logits, 0, 1), out_lens
            )
            # (S, N, W) -> batch-major (N, W, S)
            return jnp.transpose(y, (1, 2, 0)), y_lens, y_probs

    arg_specs = [
        (
            jax.ShapeDtypeStruct((n, t, num_filts), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        )
        for n, t in specs
    ]
    return ServingArtifact.export(
        path,
        fn,
        params,
        arg_specs,
        entry="ctc_recognize",
        platforms=platforms,
        paddable=[(0, 1), (0,)],
        output_batch_axis=0,
        **mesh_kw,
        extra_meta={
            "family": "ctc",
            "width": width,
            "beta": beta,
            "fused_lm": lm is not None,
            "num_filts": num_filts,
        },
    )


def export_transducer_recognizer(
    path: str,
    model,
    params: Dict[str, Any],
    *,
    specs: Sequence[Tuple[int, int]],
    mode: str = "greedy",
    width: int = 4,
    max_symbols_per_frame: int = 4,
    lm=None,
    lm_weight: float = 0.3,
    platforms: Sequence[str] = ("cpu", "tpu"),
    mesh: Optional[Mesh] = None,
    partition_rules: Optional[Callable] = None,
) -> ServingArtifact:
    """Export an RNN-T serving head: ``artifact(feats, lens)``.

    `specs` lists ``(batch, max_frames)`` specializations. ``mode`` is
    ``"greedy"`` (outputs ``hyps (N, U)``, ``lens (N,)``) or ``"beam"``
    (outputs ``hyps (N, W, U)``, ``lens (N, W)``, ``scores (N, W)``,
    optional shallow-fusion `lm`). `mesh` + `partition_rules` (e.g.
    :func:`~pydrobert_tpu.models.transducer_partition_rules`) export a
    multi-chip artifact, as in :func:`export_ctc_recognizer`.
    """
    if mode not in ("greedy", "beam"):
        raise ValueError(f"mode must be 'greedy' or 'beam', got {mode!r}")
    num_filts = model.cfg.encoder.num_filts
    mesh_kw = _mesh_kwargs(mesh, partition_rules, params)

    if mode == "greedy":

        def fn(params, feats, lens):
            return model.apply(
                {"params": params},
                feats,
                lens,
                max_symbols_per_frame,
                method="greedy",
            )

    else:

        def fn(params, feats, lens):
            return model.apply(
                {"params": params},
                feats,
                lens,
                width,
                max_symbols_per_frame,
                lm,
                lm_weight,
                method="beam",
            )

    arg_specs = [
        (
            jax.ShapeDtypeStruct((n, t, num_filts), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        )
        for n, t in specs
    ]
    return ServingArtifact.export(
        path,
        fn,
        params,
        arg_specs,
        entry="rnnt_recognize",
        platforms=platforms,
        paddable=[(0, 1), (0,)],
        output_batch_axis=0,
        **mesh_kw,
        extra_meta={
            "family": "transducer",
            "mode": mode,
            "width": width,
            "fused_lm": lm is not None,
            "num_filts": num_filts,
        },
    )
