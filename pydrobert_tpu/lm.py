"""Sequential language model protocol and shallow fusion.

Capability parity with the reference's ``_lm.py`` LM abstractions:
``SequentialLanguageModel`` (``_lm.py:45-288``),
``ExtractableSequentialLanguageModel`` (``_lm.py:291-338``),
``MixableSequentialLanguageModel`` (``_lm.py:341-400``), and the
``ShallowFusionLanguageModel`` family (``_lm.py:1113-1345``).

TPU-first design: LM state is an arbitrary **pytree** (typically a dict of
arrays) rather than a ``Dict[str, Tensor]``, so ``extract_by_src`` (beam
reordering) and ``mix_by_mask`` (CTC fusion selection) have generic default
implementations via ``jax.tree`` — LMs only override them for exotic state.
All methods must be pure and jittable: ``hist`` is an int array ``(S, N)``,
``idx`` a scalar or ``(N,)`` int array, and parameters live wherever the
implementer keeps them (e.g. closed-over flax variables or attributes that
are jit-constant).
"""

import abc
import warnings
from logging import Logger
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .utils import pytree as _pytree

__all__ = [
    "ExtractableSequentialLanguageModel",
    "ExtractableShallowFusionLanguageModel",
    "LookupLanguageModel",
    "MixableSequentialLanguageModel",
    "MixableShallowFusionLanguageModel",
    "SequentialLanguageModel",
    "ShallowFusionLanguageModel",
]

StateDict = Dict[str, Any]


class SequentialLanguageModel(abc.ABC):
    """Distribution over the next token in a sequence.

    Subclasses implement :func:`calc_idx_log_probs`; the default
    :func:`calc_full_log_probs` iterates it. Calling the model mirrors the
    reference's ``forward`` (``_lm.py:253-288``): with ``idx`` set, returns
    ``(log_probs_idx, next_state)``; with ``idx=None``, returns the stacked
    ``(S + 1, N, vocab_size)`` log probabilities.
    """

    vocab_size: int

    def __init__(self, vocab_size: int):
        from . import argcheck

        self.vocab_size = argcheck.is_posi(vocab_size, "vocab_size")

    def update_input(self, prev: StateDict, hist: jax.Array) -> StateDict:
        """Populate the initial state before any log-probability queries.

        Must be idempotent (reference ``_lm.py:140-167``).
        """
        return prev

    @abc.abstractmethod
    def calc_idx_log_probs(
        self, hist: jax.Array, prev: StateDict, idx: jax.Array
    ) -> Tuple[jax.Array, StateDict]:
        """Log probs ``(N, vocab_size)`` over token ``idx`` given ``hist[:idx]``.

        `idx` is a scalar or ``(N,)`` int array in ``[0, hist.shape[0]]``;
        `prev` is the state after ``idx - 1`` and the returned state is the
        state after `idx`.
        """
        ...

    def calc_full_log_probs(self, hist: jax.Array, prev: StateDict) -> jax.Array:
        """Stacked log probs over all ``S + 1`` prefixes of `hist`."""
        log_probs = []
        for idx in range(hist.shape[0] + 1):
            log_probs_idx, prev = self.calc_idx_log_probs(
                hist, prev, jnp.asarray(idx, jnp.int32)
            )
            log_probs.append(log_probs_idx)
        return jnp.stack(log_probs, 0)

    def __call__(
        self,
        hist: jax.Array,
        prev: Optional[StateDict] = None,
        idx: Optional[Union[int, jax.Array]] = None,
    ):
        prev = {} if prev is None else prev
        hist = jnp.asarray(hist)
        if hist.ndim != 2:
            raise RuntimeError("hist must be 2 dimensional")
        S, N = hist.shape
        prev = self.update_input(prev, hist)
        if idx is None:
            return self.calc_full_log_probs(hist, prev)
        idx_ = jnp.asarray(idx, jnp.int32)
        if idx_.ndim == 1 and idx_.shape[0] == 1:
            idx_ = idx_[0]
        elif idx_.ndim == 1 and idx_.shape[0] != N:
            raise RuntimeError(
                f"Expected dim 0 of idx to be of size {N}, got {idx_.shape[0]}"
            )
        idx_ = (idx_ + S + 1) % (S + 1)
        return self.calc_idx_log_probs(hist, prev, idx_)


class ExtractableSequentialLanguageModel(SequentialLanguageModel):
    """An LM whose state can be reordered/subsampled along the batch axis.

    Needed by searches that shuffle beams (reference ``_lm.py:291-338``).
    The default implementation indexes every state leaf's first axis; LMs
    with batch-independent state leaves should override.
    """

    def extract_by_src(self, prev: StateDict, src: jax.Array) -> StateDict:
        return _pytree.extract_by_src(prev, src)


class MixableSequentialLanguageModel(ExtractableSequentialLanguageModel):
    """An LM whose states can be mixed elementwise along the batch axis.

    Needed by :class:`CTCPrefixSearch` shallow fusion (reference
    ``_lm.py:341-400``).
    """

    def mix_by_mask(
        self, prev_true: StateDict, prev_false: StateDict, mask: jax.Array
    ) -> StateDict:
        return _pytree.mix_by_mask(prev_true, prev_false, mask)


class ShallowFusionLanguageModel(SequentialLanguageModel):
    """Log-linear combination of two LMs: ``first + beta * second``.

    States of the two sub-models are kept in a single dict under key
    prefixes (``first_prefix``/``second_prefix``), as in the reference
    (``_lm.py:1113-1259``).
    """

    def __init__(
        self,
        first: SequentialLanguageModel,
        second: SequentialLanguageModel,
        beta: float = 0.0,
        first_prefix: str = "first.",
        second_prefix: str = "second.",
    ):
        from . import argcheck

        if first.vocab_size != second.vocab_size:
            raise ValueError(
                "first and second vocab_size must match, got "
                f"{first.vocab_size} and {second.vocab_size}"
            )
        if first_prefix == second_prefix:
            raise ValueError("first_prefix and second_prefix cannot match")
        super().__init__(first.vocab_size)
        self.first, self.second = first, second
        self.beta = argcheck.is_float(beta, "beta")
        self.first_prefix = argcheck.is_str(first_prefix, "first_prefix")
        self.second_prefix = argcheck.is_str(second_prefix, "second_prefix")

    def split_dicts(self, prev: StateDict) -> Tuple[StateDict, StateDict]:
        prev_first, prev_second = {}, {}
        for k, v in prev.items():
            if k.startswith(self.first_prefix):
                prev_first[k[len(self.first_prefix):]] = v
            elif k.startswith(self.second_prefix):
                prev_second[k[len(self.second_prefix):]] = v
            else:
                raise RuntimeError(
                    f"key '{k}' from prev does not start with first_prefix "
                    f"'{self.first_prefix}' nor second_prefix "
                    f"'{self.second_prefix}'"
                )
        return prev_first, prev_second

    def merge_dicts(
        self, prev_first: StateDict, prev_second: StateDict
    ) -> StateDict:
        prev = {self.first_prefix + k: v for k, v in prev_first.items()}
        prev.update(
            (self.second_prefix + k, v) for k, v in prev_second.items()
        )
        return prev

    def update_input(self, prev: StateDict, hist: jax.Array) -> StateDict:
        a, b = self.split_dicts(prev)
        return self.merge_dicts(
            self.first.update_input(a, hist), self.second.update_input(b, hist)
        )

    def calc_idx_log_probs(self, hist, prev, idx):
        a, b = self.split_dicts(prev)
        lp_a, cur_a = self.first.calc_idx_log_probs(hist, a, idx)
        lp_b, cur_b = self.second.calc_idx_log_probs(hist, b, idx)
        return lp_a + self.beta * lp_b, self.merge_dicts(cur_a, cur_b)

    def calc_full_log_probs(self, hist, prev):
        a, b = self.split_dicts(prev)
        return self.first.calc_full_log_probs(
            hist, a
        ) + self.beta * self.second.calc_full_log_probs(hist, b)


class ExtractableShallowFusionLanguageModel(
    ShallowFusionLanguageModel, ExtractableSequentialLanguageModel
):
    """Shallow fusion of two extractable LMs (reference ``_lm.py:1262-1302``)."""

    def extract_by_src(self, prev: StateDict, src: jax.Array) -> StateDict:
        a, b = self.split_dicts(prev)
        return self.merge_dicts(
            self.first.extract_by_src(a, src), self.second.extract_by_src(b, src)
        )


class MixableShallowFusionLanguageModel(
    ExtractableShallowFusionLanguageModel, MixableSequentialLanguageModel
):
    """Shallow fusion of two mixable LMs (reference ``_lm.py:1305-1345``)."""

    def mix_by_mask(
        self, prev_true: StateDict, prev_false: StateDict, mask: jax.Array
    ) -> StateDict:
        at, bt = self.split_dicts(prev_true)
        af, bf = self.split_dicts(prev_false)
        return self.merge_dicts(
            self.first.mix_by_mask(at, af, mask),
            self.second.mix_by_mask(bt, bf, mask),
        )


# ---------------------------------------------------------------------------
# LookupLanguageModel: backoff n-gram model via open-addressing hash tables
# ---------------------------------------------------------------------------

_EMPTY_KEY = np.int32(np.iinfo(np.int32).min)
_FNV_BASIS = np.uint32(2166136261)
_FNV_PRIME = np.uint32(16777619)


def _fnv_mix_np(h: np.ndarray, x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (h ^ x.astype(np.uint32)) * _FNV_PRIME


def _fnv_fin_np(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint32(15))
        h = h * np.uint32(0x85EBCA6B)
        return h ^ (h >> np.uint32(13))


def _fnv_mix_jnp(h: jax.Array, x: jax.Array) -> jax.Array:
    return (h ^ x.astype(jnp.uint32)) * jnp.uint32(int(_FNV_PRIME))


def _fnv_fin_jnp(h: jax.Array) -> jax.Array:
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(0x85EBCA6B)
    return h ^ (h >> jnp.uint32(13))


_DENSE_CTX_MAX_ROWS = 1 << 21
"""Largest ``(base)**n`` for which a context table stores a directly
indexed dense row array instead of (only) the probing hash table. A dense
lookup is ONE gather; a hash lookup is ``max_probe`` gathers plus key
compares — on TPU, where each gather is a fixed-overhead kernel, the dense
form is much cheaper inside decode loops."""


class _CtxTable:
    """Hash table over contexts: ``ctx (n ids) -> (logb, row_start,
    row_len)`` plus CSR children arrays ``(tok, logp)`` grouped by context.

    The KenLM-trie-style layout reorganized for batched device queries: one
    context lookup (a few small probe gathers — or a single direct-indexed
    gather when ``base**n`` is small, see ``_DENSE_CTX_MAX_ROWS``) fetches
    the backoff AND the span of that context's continuations; scoring all
    ``V`` extensions is a gather of at most `max_children` (token, logp)
    pairs plus a scatter — no per-(context, token) probing.
    """

    def __init__(
        self,
        entries: Dict[Tuple[int, ...], Tuple[float, int, int]],
        child_tok: np.ndarray,
        child_logp: np.ndarray,
        n: int,
        max_children: int,
        base: int = 0,
        uni: Optional[np.ndarray] = None,
    ):
        self.uni = uni
        count = len(entries)
        # 4x load headroom keeps linear-probe chains short
        size = 1 << max(1, (max(4 * count, 2) - 1).bit_length())
        keys = np.full((size, n), _EMPTY_KEY, np.int32)
        fvals = np.zeros((size,), np.float32)
        ivals = np.zeros((size, 2), np.int32)
        mask = np.uint32(size - 1)
        max_probe = 0
        for key, (logb, start, length) in entries.items():
            h = _FNV_BASIS
            for tok in key:
                h = _fnv_mix_np(h, np.uint32(np.int64(tok)))
            h = _fnv_fin_np(h)
            # double hashing: an odd, hash-derived stride breaks the
            # clustering linear probing suffers under FNV (max_probe 8 -> ~3
            # at the same load factor), and probe count = device gather count
            step = int((h >> np.uint32(16)) | np.uint32(1))
            probe = 1
            slot = int(h & mask)
            while keys[slot, 0] != _EMPTY_KEY:
                slot = (slot + step) & int(mask)
                probe += 1
            keys[slot] = key
            fvals[slot] = logb
            ivals[slot] = (start, length)
            max_probe = max(max_probe, probe)
        self.n, self.size, self.max_probe = n, size, max_probe
        self.keys, self.fvals, self.ivals = keys, fvals, ivals
        self.child_tok = child_tok
        self.child_logp = child_logp
        self.max_children = int(max_children)
        self.base = int(base)
        self._pack()

    def set_logz(self, logzs: Dict[Tuple[int, ...], float]) -> None:
        """Attach per-context exact normalizers (slot-aligned) and repack."""
        lz = np.zeros((self.size,), np.float32)
        occupied = self.keys[:, 0] != _EMPTY_KEY
        for slot in np.nonzero(occupied)[0]:
            key = tuple(int(t) for t in self.keys[slot])
            if key in logzs:
                lz[slot] = logzs[key]
        self.logz_slot = lz
        self._pack()

    def _pack(self):
        """Fuse per-slot data into single rows so each probe (and each child
        read) is ONE device gather: ``packed (size, n + 3)`` int32 =
        ``[key tokens..., logb bits, row_start, row_len]``; ``child (rows,
        2)`` int32 = ``[token, logp bits]``. Gathers on TPU carry a fixed
        per-op cost, so 1 wide gather beats 3 narrow ones. When ``base**n``
        is small, additionally store ``dense_packed (base**n, 3 or 4)`` =
        ``[logb bits, row_start, row_len, logZ bits]`` directly indexed by
        the flat context id (one gather, no probing); the logZ column
        appears once :meth:`set_logz` has run."""
        self.packed = np.concatenate(
            [
                self.keys,
                self.fvals[:, None].view(np.int32),
                self.ivals,
            ],
            1,
        )
        ct = self.child_tok if len(self.child_tok) else np.zeros(1, np.int32)
        cl = (
            self.child_logp
            if len(self.child_logp)
            else np.zeros(1, np.float32)
        )
        cols = [ct, cl.view(np.int32)]
        if getattr(self, "uni", None) is not None:
            # bake each child token's unigram log-prob into its row: the
            # normalizer computation then needs no separate uni gather
            cu = self.uni[np.clip(ct, 0, len(self.uni) - 1)].astype(
                np.float32
            )
            cols.append(cu.view(np.int32))
        self.child_packed = np.stack(cols, 1)
        self.dense_packed = None
        if 0 < self.base and self.base ** self.n <= _DENSE_CTX_MAX_ROWS:
            rows = self.base ** self.n
            lz = getattr(self, "logz_slot", None)
            dense = np.zeros((rows, 3 if lz is None else 4), np.int32)
            occupied = self.keys[:, 0] != _EMPTY_KEY
            flat = np.zeros((occupied.sum(),), np.int64)
            kk = self.keys[occupied].astype(np.int64)
            for j in range(self.n):
                flat = flat * self.base + kk[:, j]
            dense[flat, 0] = self.fvals[occupied].view(np.int32)
            dense[flat, 1:3] = self.ivals[occupied]
            if lz is not None:
                dense[flat, 3] = lz[occupied].view(np.int32)
            # a found flag is unnecessary: the default row (logb = +0.0 bits,
            # len = 0) behaves exactly like an absent context
            self.dense_packed = dense

    def lookup_ctx(self, qkeys: jax.Array):
        """(found, logb, start, length) for query contexts ``(B, n)``."""
        n = self.n
        if self.dense_packed is not None:
            dense = jnp.asarray(self.dense_packed)
            flat = jnp.zeros(qkeys.shape[:-1], jnp.int32)
            in_range = jnp.ones(qkeys.shape[:-1], bool)
            for j in range(n):
                q = qkeys[..., j]
                in_range = in_range & (q >= 0) & (q < self.base)
                flat = flat * self.base + jnp.clip(q, 0, self.base - 1)
            row = dense[flat]  # (B, 3): ONE gather, no probing
            # out-of-range tokens must read as not-found (the probing path
            # reports a key mismatch); otherwise the clip aliases them onto
            # real stored contexts
            length = jnp.where(in_range, row[..., 2], 0)
            logb = jnp.where(
                in_range,
                jax.lax.bitcast_convert_type(row[..., 0], jnp.float32),
                0.0,
            )
            found = (length > 0) | (logb != 0.0)
            return found, logb, row[..., 1], length
        packed = jnp.asarray(self.packed)
        h = jnp.full(qkeys.shape[:-1], int(_FNV_BASIS), jnp.uint32)
        for j in range(n):
            h = _fnv_mix_jnp(h, qkeys[..., j])
        h = _fnv_fin_jnp(h)
        mask = jnp.uint32(self.size - 1)
        step = (h >> jnp.uint32(16)) | jnp.uint32(1)
        found = jnp.zeros(h.shape, bool)
        row = jnp.zeros(h.shape + (3,), jnp.int32)
        for d in range(self.max_probe):
            slot = ((h + jnp.uint32(d) * step) & mask).astype(jnp.int32)
            r = packed[slot]  # (B, n + 3): one gather per probe
            match = jnp.all(r[..., :n] == qkeys, -1) & ~found
            row = jnp.where(match[..., None], r[..., n:], row)
            found = found | match
        logb = jax.lax.bitcast_convert_type(row[..., 0], jnp.float32)
        return found, logb, row[..., 1], row[..., 2]

    def probe_children(self, qkeys: jax.Array):
        """Per-context children as padded lists: ``(found, logb, toks (B, S),
        logps (B, S), valid (B, S), unis (B, S))`` for query contexts
        ``(B, n)``; ``S = max_children``. ``unis`` are the children's
        unigram log-probs (baked into the rows at build time) or None."""
        found, logb, start, length = self.lookup_ctx(qkeys)
        B = qkeys.shape[0]
        S = self.max_children
        has_uni = self.child_packed.shape[1] > 2
        if S == 0:
            z = jnp.zeros((B, 0), jnp.float32)
            return (
                found,
                logb,
                jnp.zeros((B, 0), jnp.int32),
                z,
                jnp.zeros((B, 0), bool),
                z if has_uni else None,
            )
        rows = self.child_packed.shape[0]
        child = jnp.asarray(self.child_packed)
        pos = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
        valid = (jnp.arange(S)[None] < length[:, None]) & found[:, None]
        pos = jnp.clip(pos, 0, rows - 1)
        got = child[pos]  # (B, S, 2 or 3)
        toks = got[..., 0]
        lps = jax.lax.bitcast_convert_type(got[..., 1], jnp.float32)
        unis = (
            jax.lax.bitcast_convert_type(got[..., 2], jnp.float32)
            if has_uni
            else None
        )
        return found, logb, toks, lps, valid, unis

    def extend_scores(self, qkeys: jax.Array, base: jax.Array) -> jax.Array:
        """Scores over all V extensions of contexts ``(B, n)``: children's
        stored log-probs where present, else ``base + logb`` (backoff)."""
        B, V = base.shape
        found, logb, start, length = self.lookup_ctx(qkeys)
        out = base + jnp.where(found, logb, 0.0)[:, None]
        S = self.max_children
        if S == 0:
            return out
        rows = self.child_packed.shape[0]
        child = jnp.asarray(self.child_packed)
        pos = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None]  # (B, S)
        valid = (jnp.arange(S)[None] < length[:, None]) & found[:, None]
        pos = jnp.clip(pos, 0, rows - 1)
        got = child[pos]  # (B, S, 2): one gather for both token and logp
        toks = jnp.where(valid, got[..., 0], V)  # V -> never selected
        lps = jax.lax.bitcast_convert_type(got[..., 1], jnp.float32)
        # statically unrolled compare/select instead of a scatter (scatters
        # serialize on TPU); (ctx, token) pairs are unique so order is moot
        iota_v = jnp.arange(V, dtype=jnp.int32)[None]
        for s in range(S):
            out = jnp.where(
                iota_v == toks[:, s : s + 1], lps[:, s : s + 1], out
            )
        return out


class LookupLanguageModel(MixableSequentialLanguageModel):
    r"""Backoff n-gram language model from a fixed lookup table.

    Computes :math:`\Pr(w_t | w_{t-1}, \ldots, w_{t-(N-1)})` from stored
    n-gram log-probabilities, backing off to shorter histories with a
    penalty when the full n-gram is absent; missing entries have probability
    0 and missing backoff penalties 1. Histories shorter than ``N - 1`` are
    padded with `sos`. Capability parity with the reference's
    ``LookupLanguageModel`` (``_lm.py:518-904``, validated there against
    KenLM).

    TPU-first design: instead of the reference's reverse trie (pointer
    chasing with data-dependent descendant scans, ``_lm.py:403-515``), each
    n-gram order is an open-addressing **hash table** in flat device arrays
    (like KenLM's "probing" format [heafield2011]). A query for all ``V``
    extensions of a batch of histories is a fixed number of vectorized
    gathers per order — no sequential dependence, no sos id shifting, exact
    (full keys are stored and compared).

    Stateless as a sequential LM: the state dict is empty and histories are
    re-queried each step.
    """

    def __init__(
        self,
        vocab_size: int,
        sos: int,
        prob_dicts: Optional[List[dict]] = None,
        destructive: bool = False,
        logger: Optional[Logger] = None,
    ):
        from . import argcheck

        super().__init__(vocab_size)
        self.sos = argcheck.is_int(sos, "sos")
        info = logger.info if logger is not None else (lambda msg: None)
        V = vocab_size
        if prob_dicts is None:
            prob_dicts = [{w: -float(np.log(V)) for w in range(V)}]
        elif not len(prob_dicts):
            raise ValueError("prob_dicts must contain at least unigrams")
        elif not destructive:
            prob_dicts = [d.copy() for d in prob_dicts]
        N = self.max_ngram = len(prob_dicts)
        if not prob_dicts[-1]:
            raise ValueError("Final element in prob_dicts must not be empty")
        valid_ids = set(range(V))
        valid_ids.add(sos)
        # validate ids and auto-complete missing contexts with (-inf, 0.0),
        # mirroring the reference's trie build (_lm.py:922-962)
        for n in range(N - 1, -1, -1):
            info(f"checking prob_dict of order {n + 1}")
            prob_dict = prob_dicts[n]
            if n == 0:
                extra = set(prob_dict) - valid_ids
                if extra:
                    raise ValueError(
                        f"Unexpected unigrams in prob_dicts: {extra} "
                        "(are these ids?)"
                    )
            else:
                for seq in list(prob_dict):
                    if not isinstance(seq, tuple) or len(seq) != n + 1:
                        raise ValueError(
                            f"Key {seq} in {n + 1}-gram is not a sequence of "
                            f"length {n + 1}"
                        )
                    extra = set(seq) - valid_ids
                    if extra:
                        raise ValueError(
                            f"Unexpected tokens in {n + 1}-gram in "
                            f"prob_dicts: {extra} (are these ids?)"
                        )
                    suffix = seq[1:] if len(seq) > 2 else seq[1]
                    if suffix not in prob_dicts[n - 1]:
                        prob_dicts[n - 1][suffix] = (-float("inf"), 0.0)
        # dense unigram log-probs over [0, V); sos's unigram prob is never
        # queried (it can't be a next token in [0, V)) but its backoff is
        uni = np.full((V,), -np.inf, np.float32)
        for w, val in prob_dicts[0].items():
            logp = val[0] if N > 1 else val
            if isinstance(logp, tuple):  # unigram-only model with backoffs
                logp = logp[0]
            if 0 <= w < V:
                uni[w] = logp
        self._uni_logp = uni
        self._sum_u = float(np.exp(uni[np.isfinite(uni)]).sum())
        # one table per context order n (1..N-1): backoff + CSR span over
        # the order-(n+1) continuations of that context
        self._ctx_tables: List[_CtxTable] = []
        kid_maps: List[Dict[Tuple[int, ...], List[Tuple[int, float]]]] = []
        logb_maps: List[Dict[Tuple[int, ...], float]] = []
        for n in range(0, N - 1):
            children: Dict[Tuple[int, ...], List[Tuple[int, float]]] = {}
            for key, val in prob_dicts[n + 1].items():
                logp = float(val[0]) if n + 1 < N - 1 else float(
                    val if not isinstance(val, tuple) else val[0]
                )
                if not np.isfinite(logp):
                    continue
                if not 0 <= int(key[-1]) < V:
                    # grams predicting a non-vocab token (e.g. ending in
                    # sos) can never be queried as extensions; storing them
                    # would corrupt the sparse correction lists / normalizer
                    continue
                ctx = tuple(key[:-1])
                children.setdefault(ctx, []).append((int(key[-1]), logp))
            entries: Dict[Tuple[int, ...], Tuple[float, int, int]] = {}
            tok_rows: List[int] = []
            logp_rows: List[float] = []
            max_children = 0
            ctxs = set(children)
            for key, val in prob_dicts[n].items():
                key_t = (key,) if n == 0 else tuple(key)
                if float(val[1]) != 0.0:
                    ctxs.add(key_t)
            for ctx in sorted(ctxs):
                val = prob_dicts[n].get(ctx[0] if n == 0 else ctx)
                logb = float(val[1]) if val is not None else 0.0
                kids = children.get(ctx, [])
                entries[ctx] = (logb, len(tok_rows), len(kids))
                max_children = max(max_children, len(kids))
                for tok, logp in kids:
                    tok_rows.append(tok)
                    logp_rows.append(logp)
            info(
                f"building context table of order {n + 1} "
                f"({len(entries)} contexts, {len(tok_rows)} continuations)"
            )
            self._ctx_tables.append(
                _CtxTable(
                    entries,
                    np.asarray(tok_rows, np.int32),
                    np.asarray(logp_rows, np.float32),
                    n + 1,
                    max_children,
                    base=(max(V, sos) + 1) if sos >= 0 else 0,
                    uni=uni,
                )
            )
            kid_maps.append(children)
            logb_maps.append(
                {ctx: lbs for ctx, (lbs, _, _) in entries.items()}
            )
        self._store_logzs(kid_maps, logb_maps)

    def _store_logzs(self, kid_maps, logb_maps) -> None:
        """Compute the EXACT normalizer of every stored context's full
        conditional distribution (float64, host-side, bottom-up by context
        length) and store it in the tables. Decode loops then read ``logZ``
        with the same row gather that fetches the backoff — the on-device
        exp-reductions over correction lists (and their gathers) disappear
        from the per-frame hot path. An absent context's distribution
        equals its suffix context's (backoff weight 1), so the decode-side
        rule "highest stored order wins, else next" is exact."""
        uni = self._uni_logp.astype(np.float64)
        sum_u = float(np.exp(uni[np.isfinite(uni)]).sum())
        # dict-valued children for O(1) membership: the value() walk below
        # runs once per stored n-gram, and linear scans of wide children
        # lists would make the build quadratic for KenLM-scale models
        kid_dicts = [
            {ctx: dict(kids) for ctx, kids in m.items()} for m in kid_maps
        ]

        def value(v: int, ctx: Tuple[int, ...]) -> float:
            """lm(v | ctx), walking the backoff chain (earliest-first)."""
            pen = 0.0
            for L in range(len(ctx), 0, -1):
                sub = ctx[len(ctx) - L:]
                logp = kid_dicts[L - 1].get(sub, {}).get(v)
                if logp is not None:
                    return pen + logp
                pen += logb_maps[L - 1].get(sub, 0.0)
            return pen + float(uni[v])

        zmemo: Dict[Tuple[int, ...], float] = {(): sum_u}

        def zof(ctx: Tuple[int, ...]) -> float:
            if ctx in zmemo:
                return zmemo[ctx]
            L = len(ctx)
            if L == 0:
                return sum_u
            kids = kid_maps[L - 1].get(ctx)
            logb = logb_maps[L - 1].get(ctx)
            if kids is None and logb is None:
                z = zof(ctx[1:])
            else:
                parent = ctx[1:]
                zp = zof(parent)
                child_mass = replaced = 0.0
                for tok, logp in kids or ():
                    child_mass += float(np.exp(logp))
                    replaced += float(np.exp(value(tok, parent)))
                z = child_mass + float(np.exp(logb or 0.0)) * max(
                    zp - replaced, 0.0
                )
            zmemo[ctx] = z
            return z

        for L in range(1, len(self._ctx_tables) + 1):
            table = self._ctx_tables[L - 1]
            logzs = {}
            for ctx in set(kid_maps[L - 1]) | set(logb_maps[L - 1]):
                logzs[ctx] = float(np.log(max(zof(ctx), 1e-300)))
            table.set_logz(logzs)

    def extract_by_src(self, prev: StateDict, src: jax.Array) -> StateDict:
        return prev

    def mix_by_mask(self, prev_true, prev_false, mask) -> StateDict:
        return prev_true

    def _context(self, hist: jax.Array, idx: jax.Array) -> jax.Array:
        """Last ``N - 1`` tokens before `idx`, sos-padded: ``(N - 1, B)``,
        most recent first."""
        S, B = hist.shape
        N = self.max_ngram
        idxs = jnp.broadcast_to(jnp.asarray(idx, jnp.int32), (B,))
        pos = idxs[None, :] - 1 - jnp.arange(N - 1, dtype=jnp.int32)[:, None]
        if S == 0:
            return jnp.full((N - 1, B), self.sos, jnp.int32)
        gathered = hist[jnp.clip(pos, 0, S - 1), jnp.arange(B)[None, :]]
        return jnp.where(pos >= 0, gathered.astype(jnp.int32), self.sos)

    def calc_idx_log_probs(
        self, hist: jax.Array, prev: StateDict, idx: jax.Array
    ) -> Tuple[jax.Array, StateDict]:
        hist = jnp.asarray(hist)
        if hist.ndim != 2:
            raise RuntimeError("hist must be 2 dimensional")
        B = hist.shape[1]
        V, N = self.vocab_size, self.max_ngram
        lp = jnp.broadcast_to(jnp.asarray(self._uni_logp), (B, V))
        if N == 1:
            return lp, prev
        ctx = self._context(hist, idx)  # (N-1, B), most recent first
        for n in range(2, N + 1):
            # context tokens earliest-first: (w_{t-n+1}, ..., w_{t-1})
            ctx_n = ctx[: n - 1][::-1].T  # (B, n-1)
            lp = self._ctx_tables[n - 2].extend_scores(ctx_n, lp)
        return lp, prev

    def calc_full_log_probs(self, hist: jax.Array, prev: StateDict) -> jax.Array:
        hist = jnp.asarray(hist)
        S = hist.shape[0]

        def step(t):
            return self.calc_idx_log_probs(hist, prev, t)[0]

        return jax.vmap(step)(jnp.arange(S + 1, dtype=jnp.int32))

    # -- sparse structure for slot-based decoding ---------------------------
    @property
    def max_corrections(self) -> int:
        """Static bound on per-context non-unigram token corrections."""
        return sum(t.max_children for t in self._ctx_tables)

    def _combined_tables(self):
        """Stack all orders' dense context rows (and child rows) into single
        arrays so one gather answers every order at once (gathers carry a
        fixed per-op cost on TPU). None when any order lacks a dense table."""
        if self.max_ngram == 1:
            return None
        if any(
            t.dense_packed is None or t.dense_packed.shape[1] != 4
            for t in self._ctx_tables
        ):
            return None
        cached = getattr(self, "_combined_cache", None)
        if cached is None:
            row_offs, parts, child_offs, ctoks, clps = [], [], [], [], []
            off = coff = 0
            for t in self._ctx_tables:
                row_offs.append(off)
                parts.append(t.dense_packed)
                off += t.dense_packed.shape[0]
                child_offs.append(coff)
                # children kept as SEPARATE flat (token int32, logp f32)
                # arrays: two clean single-axis gathers whose outputs land
                # directly in the consumers' (B, Ctot) layout — the packed
                # (rows, 2) form cost a slice + bitcast + relayout-copy
                # chain per column every decode step
                ct = (
                    t.child_tok
                    if len(t.child_tok)
                    else np.zeros(1, np.int32)
                )
                cl = (
                    t.child_logp
                    if len(t.child_logp)
                    else np.zeros(1, np.float32)
                )
                ctoks.append(np.ascontiguousarray(ct, np.int32))
                clps.append(np.ascontiguousarray(cl, np.float32))
                coff += len(ct)
            # Build-time shadow bitmasks (decode-loop dedup for free): a
            # lower-order child slot is invalid when its token also appears
            # among a FOUND higher-order context's children (highest stored
            # order wins — reference `_lm.py` backoff semantics). That
            # membership depends only on the two stored contexts, one a
            # suffix of the other, so it is precomputable: order-j rows
            # grow `ceil(s_i / 32)` int32 words per lower order i, bit c of
            # pair (i, j) set iff slot c of the lower context's child list
            # is shadowed. The decode-step probe then replaces its
            # (B, s_i, s_j) compare/any/relayout chain (measured ~6
            # dispatched kernels per decode step) with fused bit tests on
            # the rows it already gathers. Construction is fully
            # vectorized (one sort-based np.isin per (lower, higher) order
            # pair over flat (row, token) keys — no per-context Python
            # loop, so million-context dense LMs build in seconds), and a
            # row stores only ITS OWN order's pairs: different orders
            # reuse the same column indices (each gathered row belongs to
            # exactly one order), keeping the row width at
            # 4 + max_j sum_{i<j} words[i].
            s_list = [t.max_children for t in self._ctx_tables]
            nt = len(self._ctx_tables)
            words = [max(1, -(-s // 32)) for s in s_list]
            dup_cols = [dict() for _ in range(nt)]
            for j in range(1, nt):
                col = 4
                for i in range(j):
                    dup_cols[j][i] = (col, words[i])
                    col += words[i]
            R = 4 + (sum(words[: nt - 1]) if nt > 1 else 0)
            base = self._ctx_tables[0].base
            radix = np.int64(self.vocab_size + 2)
            for j in range(1, nt):
                dj = parts[j]
                wide = np.zeros((dj.shape[0], R), np.int32)
                wide[:, : dj.shape[1]] = dj
                wide_u = wide.view(np.uint32)
                occ = np.nonzero(dj[:, 2] > 0)[0]
                for i in range(j):
                    if not len(occ):
                        break
                    di = parts[i]
                    # lower context flat id = suffix of the higher one in
                    # most-recent-first coordinates
                    lor = occ % (base ** (i + 1))
                    li = di[lor, 2]
                    sel = li > 0
                    occ2, lor2 = occ[sel], lor[sel]
                    if not len(occ2):
                        continue
                    li2 = di[lor2, 2].astype(np.int64)
                    si2 = di[lor2, 1].astype(np.int64)
                    lj2 = dj[occ2, 2].astype(np.int64)
                    sj2 = dj[occ2, 1].astype(np.int64)
                    # flat (pair row, token) keys for both sides
                    rep = np.repeat(np.arange(len(occ2)), li2)
                    offs = np.concatenate([[0], np.cumsum(li2)])
                    slot = np.arange(offs[-1], dtype=np.int64) - offs[rep]
                    lo_tok = ctoks[i][si2[rep] + slot].astype(np.int64)
                    key_lo = rep.astype(np.int64) * radix + lo_tok
                    hrep = np.repeat(np.arange(len(occ2)), lj2)
                    hoffs = np.concatenate([[0], np.cumsum(lj2)])
                    hslot = (
                        np.arange(hoffs[-1], dtype=np.int64) - hoffs[hrep]
                    )
                    hi_tok = ctoks[j][sj2[hrep] + hslot].astype(np.int64)
                    key_hi = hrep.astype(np.int64) * radix + hi_tok
                    hit = np.isin(key_lo, key_hi)
                    c0, _ = dup_cols[j][i]
                    rr = occ2[rep[hit]]
                    ss = slot[hit]
                    np.bitwise_or.at(
                        wide_u,
                        (rr, c0 + (ss >> 5)),
                        np.uint32(1) << (ss & 31).astype(np.uint32),
                    )
                parts[j] = wide
            if R > 4:
                for j in range(nt):
                    if parts[j].shape[1] < R:
                        pad = np.zeros(
                            (parts[j].shape[0], R), np.int32
                        )
                        pad[:, : parts[j].shape[1]] = parts[j]
                        parts[j] = pad
            cached = self._combined_cache = (
                np.concatenate(parts, 0),
                np.concatenate(ctoks, 0),
                np.concatenate(clps, 0),
                row_offs,
                child_offs,
                s_list,
                dup_cols,
            )
        return cached

    def sparse_corrections(self, ctx: jax.Array, want_logz: bool = True):
        """Backoff-LM log-probs as ``uni[v] + base`` plus sparse overrides.

        For query contexts ``ctx`` (``(Ng - 1, *B)`` token ids, most recent
        first, as produced by the history gather; ``*B`` is any leading
        batch shape — see :meth:`sparse_corrections_ext`'s shape note), the
        conditional log-prob of every token ``v`` decomposes as::

            lm(v | ctx) = uni[v] + base          if v matches no stored
                                                  higher-order n-gram
                        = vals[c]                if toks[c] == v (highest
                                                  matching order wins)

        where ``base`` is the summed backoff of all found context orders.
        Returns ``(base (*B,), toks (*B, C), vals (*B, C), valid (*B, C),
        logZ (*B,))`` with static ``C = max_corrections``; ``logZ`` is the
        exact log-normalizer of this context's full distribution (what
        ``log_softmax`` over :func:`calc_idx_log_probs` would subtract).

        This is the structure that lets beam searches score only candidate
        tokens instead of all ``V`` extensions (KenLM-style probing, but
        batched: one probe chain per context order, children fetched as
        padded spans).
        """
        return self.sparse_corrections_ext(ctx, want_logz)[:5]

    def sparse_corrections_ext(self, ctx: jax.Array, want_logz: bool = True):
        """:meth:`sparse_corrections` plus the per-order structure decode
        loops exploit: returns ``(base, toks, vals, valid, logZ,
        logb (B, N-1), bounds)`` where ``logb`` holds each found context
        order's backoff weight and ``bounds`` are the static slot ranges of
        each order inside the concatenated correction axis.

        ``ctx`` may carry ANY leading batch shape — ``(N - 1, *batch)`` —
        and every returned array keeps those batch dims. Decode loops pass
        their native ``(N, beam)`` batch directly: flattening to one axis
        and reshaping the outputs back cost a retile (reshape/copy) kernel
        per tensor per decode step on TPU. ``ctx`` may also be a
        list/tuple of ``N - 1`` per-order ``(*batch,)`` arrays (most
        recent first): decode loops that carry contexts as separate
        arrays then pay no per-step stack/slice on the order axis."""
        N = self.max_ngram
        if N == 1:
            raise RuntimeError("sparse_corrections requires max_ngram > 1")
        ctx_list = isinstance(ctx, (list, tuple))
        if ctx_list and len(ctx) != N - 1:
            raise RuntimeError(
                f"expected {N - 1} per-order context arrays, got {len(ctx)}"
            )
        bshape = ctx[0].shape if ctx_list else ctx.shape[1:]
        uni = jnp.asarray(self._uni_logp)
        combined = self._combined_tables()
        if combined is not None:
            # one (B, 4) dense-row gather PER ORDER plus two flat child
            # gathers; everything between them is (B,)-elementwise over the
            # tiny unrolled order axis, so it fuses into the gathers'
            # operands/consumers. The earlier single (B, N-1, 4) row gather
            # + triangular-dot index prologue + one-hot spread epilogue
            # measured ~17 dispatched kernels per decode step, most of them
            # relayout copies around the (B, N-1, ...) intermediates; this
            # form measures fewer with identical results.
            (
                dense_all, ctok_all, clp_all, row_offs, child_offs, s_list,
                dup_cols,
            ) = combined
            dense_all = jnp.asarray(dense_all)
            import os as _os
            if _os.environ.get("PYDROBERT_TPU_CHILD_FLAT", "0") == "1":
                child_pack = None
                ctok_all = jnp.asarray(ctok_all)
                clp_all = jnp.asarray(clp_all)
            else:
                child_pack = jnp.asarray(
                    np.stack([ctok_all, clp_all.view(np.int32)], 1)
                )
            E = clp_all.shape[0]
            base_ix = self._ctx_tables[0].base
            # (N - 1, B) most recent first, or per-order list thereof
            q = (
                [c.astype(jnp.int32) for c in ctx]
                if ctx_list
                else ctx.astype(jnp.int32)
            )
            # order-n row index = sum_i ctx[i] * base^i over the n-1 most
            # recent context tokens: accumulate the prefix sum across the
            # unrolled loop in exact f32 (values < 2**24 whenever the
            # direct-indexed dense table itself fits memory)
            idxf = okc = None
            logb_l, start_l, len_l, logz_l, present_l = [], [], [], [], []
            rows_l, okc_l, idx_l = [], [], []
            for i in range(N - 1):
                qi = q[i]  # (B,)
                oki = (qi >= 0) & (qi < base_ix)
                okc = oki if okc is None else (okc & oki)
                t = jnp.clip(qi, 0, base_ix - 1).astype(jnp.float32) * float(
                    base_ix**i
                )
                idxf = t if idxf is None else (idxf + t)
                idx_l.append(idxf.astype(jnp.int32) + int(row_offs[i]))
                okc_l.append(okc)
            if _os.environ.get("PYDROBERT_TPU_ROWS_MERGED", "1") == "1":
                # ONE (N-1, *b, R) gather answers every order: the index
                # stack rides the ctx input's own (N-1, *b) leading axis,
                # and the per-order reads below are static major-axis
                # slices that fuse into their elementwise consumers (the
                # per-order gathers cost an index-flatten reshape + gather
                # + output reshape EACH per decode step)
                rows_all = dense_all[jnp.stack(idx_l, 0)]
                rows_l = [rows_all[i] for i in range(N - 1)]
            else:
                rows_l = [dense_all[ix] for ix in idx_l]
            for i in range(N - 1):
                rows_i, okc = rows_l[i], okc_l[i]
                # out-of-range context tokens must read as not-found (the
                # probing fallback reports a key mismatch); the all-zeros
                # default row already encodes "absent", so masking length
                # and backoff suffices — no separate found flag is needed
                len_i = jnp.where(okc, rows_i[..., 2], 0)
                logb_i = jnp.where(
                    okc,
                    jax.lax.bitcast_convert_type(rows_i[..., 0], jnp.float32),
                    0.0,
                )
                logb_l.append(logb_i)
                start_l.append(rows_i[..., 1])
                len_l.append(len_i)
                logz_l.append(
                    jax.lax.bitcast_convert_type(rows_i[..., 3], jnp.float32)
                )
                present_l.append(okc & ((len_i > 0) | (logb_i != 0.0)))
            # stored-exact normalizer: highest present order wins; an
            # absent context's distribution equals its suffix's, so falling
            # through is exact (see _store_logzs). Replaces per-step
            # exp-reductions over the correction lists.
            logZ = jnp.full(
                bshape, float(np.log(max(self._sum_u, 1e-300))), jnp.float32
            )
            for i in range(N - 1):
                logZ = jnp.where(present_l[i], logz_l[i], logZ)
            base = logb_l[0]
            for i in range(1, N - 1):
                base = base + logb_l[i]
            slot_order = np.concatenate(
                [np.full((s,), i, np.int32) for i, s in enumerate(s_list)]
            )  # (Ctot,) which order each child slot belongs to
            local_off = np.concatenate(
                [np.arange(s, dtype=np.int32) for s in s_list]
            )  # (Ctot,) slot index within its order's span

            slot_order_c = jnp.asarray(slot_order)  # (Ctot,)

            def spread(per_order):
                # (*b,) per order -> (*b, Ctot): select each order's scalar
                # over its static slot span via a broadcast-where chain —
                # pure elementwise, so it fuses into the consumers (the
                # concat-of-broadcasts form cost one standalone broadcast
                # kernel per order per spread every decode step)
                out = per_order[0][..., None]
                for i in range(1, N - 1):
                    out = jnp.where(
                        slot_order_c >= i, per_order[i][..., None], out
                    )
                return out

            # value of an order-n match = stored logp + backoffs of all
            # HIGHER orders escaped through: a suffix sum over the unrolled
            # order axis
            sfx_l = []
            for i in range(N - 1):
                s = None
                for j in range(i + 1, N - 1):
                    s = logb_l[j] if s is None else (s + logb_l[j])
                sfx_l.append(
                    jnp.zeros(bshape, jnp.float32) if s is None else s
                )
            pos = jnp.clip(
                spread(
                    [start_l[i] + int(child_offs[i]) for i in range(N - 1)]
                )
                + local_off,
                0,
                E - 1,
            )  # (*b, Ctot)
            if child_pack is not None:
                got = child_pack[pos]  # (*b, Ctot, 2): ONE row gather
                toks = got[..., 0]
                lps = jax.lax.bitcast_convert_type(got[..., 1], jnp.float32)
            else:
                toks = ctok_all[pos]  # ONE flat gather
                lps = clp_all[pos]  # ONE flat gather
            valid = local_off < spread(len_l)
            val = lps + spread(sfx_l)
            # higher-order matches override lower ones: read the shadow
            # bitmasks baked into the higher orders' (already gathered)
            # rows at build time — pure fused bit tests, replacing the
            # (B, s_i, s_j) compare/any chain that cost ~6 relayout/reduce
            # kernels per decode step
            shift_c = jnp.asarray((local_off & 31).astype(np.int32))
            dup = None
            for j in range(1, N - 1):
                wsel = np.full((local_off.shape[0],), -1, np.int32)
                for i in range(j):
                    blk = slot_order == i
                    c0 = dup_cols[j][i][0]
                    wsel[blk] = c0 + (local_off[blk] >> 5)
                used = sorted(set(int(w) for w in wsel if w >= 0))
                if not used:
                    continue
                wsel_c = jnp.asarray(wsel)
                acc = jnp.zeros(bshape + (1,), jnp.int32)
                for colidx in used:
                    acc = jnp.where(
                        wsel_c == colidx,
                        rows_l[j][..., colidx, None],
                        acc,
                    )
                d = (
                    (((acc >> shift_c) & 1) != 0)
                    & (wsel_c >= 0)
                    & okc_l[j][..., None]
                )
                dup = d if dup is None else (dup | d)
            if dup is not None:
                valid = valid & ~dup
            bounds = np.concatenate([[0], np.cumsum(s_list)])
            # only the membership-gather decode path consumes logb: the
            # stack is dead code (free) everywhere else
            logb_all = jnp.stack(logb_l, -1)  # (*b, N-1)
            return (
                base, toks, val, valid,
                logZ if want_logz else None,
                logb_all, bounds,
            )
        else:
            if ctx_list:
                # the hash-probing fallback works on the stacked (N-1, *b)
                # form; per-order lists are a hot-loop-only optimization
                ctx = jnp.stack(list(ctx), 0)
            if ctx.ndim > 2:
                # hash-probing fallback stays single-batch-axis; recurse on
                # the flattened batch and restore the dims (this path has no
                # dense tables, so the extra reshapes are the cheap part)
                flat = self.sparse_corrections_ext(
                    ctx.reshape(ctx.shape[0], -1), want_logz
                )

                def _rs(a):
                    return (
                        None
                        if a is None
                        else a.reshape(bshape + a.shape[1:])
                    )

                return tuple(_rs(a) for a in flat[:6]) + (flat[6],)
            logbs, tokss, lpss, valids, uniss = [], [], [], [], []
            for n in range(2, N + 1):
                ctx_n = ctx[: n - 1][::-1].T  # (B, n-1), earliest-first
                f, lb, tk, lp, vd, un = self._ctx_tables[
                    n - 2
                ].probe_children(ctx_n)
                logbs.append(jnp.where(f, lb, 0.0))
                tokss.append(tk)
                lpss.append(lp)
                valids.append(vd)
                uniss.append(un)
        base = sum(logbs)
        # value of an order-n match = stored logp + backoffs of all HIGHER
        # orders that will be escaped through; higher-order matches override
        # lower ones (dedup below)
        vals = []
        for i in range(len(lpss)):
            pen = sum(logbs[i + 1:]) if i + 1 < len(logbs) else 0.0
            vals.append(lpss[i] + (pen[:, None] if i + 1 < len(logbs) else 0.0))
        for i in range(len(tokss)):
            for j in range(i + 1, len(tokss)):
                dup = (
                    (tokss[i][:, :, None] == tokss[j][:, None, :])
                    & valids[j][:, None, :]
                ).any(2)
                valids[i] = valids[i] & ~dup
        toks = jnp.concatenate(tokss, 1)
        val = jnp.concatenate(vals, 1)
        valid = jnp.concatenate(valids, 1)
        logb_all = jnp.stack(logbs, 1)  # (B, N-1)
        bounds = np.concatenate(
            [[0], np.cumsum([t.shape[1] for t in tokss])]
        )
        if not want_logz:
            # rescoring paths never normalize; skip the exp-reductions
            return base, toks, val, valid, None, logb_all, bounds
        # exact normalizer: start from the all-backoff mass, swap corrected
        # tokens' unigram mass for their stored mass (children's unigram
        # log-probs ride along in the child rows — no extra gather)
        if all(u is not None for u in uniss):
            uni_at = jnp.concatenate(uniss, 1)
        else:
            uni_at = jnp.take(
                uni, jnp.clip(toks, 0, self.vocab_size - 1), axis=0
            )
        covered = jnp.where(valid, jnp.exp(uni_at), 0.0).sum(1)
        zb = jnp.maximum(self._sum_u - covered, 0.0) * jnp.exp(base)
        z = zb + jnp.where(valid, jnp.exp(val), 0.0).sum(1)
        return base, toks, val, valid, jnp.log(z), logb_all, bounds

    _DENSE_NGRAM_MAX = 1 << 23

    def order2_values(self):
        """Direct-indexed bigram log-probs: flat ``(base * V,)`` f32 with
        ``arr[c * V + v] = logp(v | c)`` and ``+inf`` marking absent pairs.

        One gather answers "is (c, v) a stored bigram, and at what value" —
        the membership/value query decode loops use for absorption masses
        and shared-slot overlap masks, replacing compares against the
        ``max_children``-wide correction lists. ``None`` when the table
        would exceed ``_DENSE_NGRAM_MAX`` entries or no bigrams exist.
        """
        if self.max_ngram < 2:
            return None
        cached = getattr(self, "_order2_cache", None)
        if cached is not None:
            return cached
        t = self._ctx_tables[0]
        V = self.vocab_size
        if t.base <= 0 or t.base * V > self._DENSE_NGRAM_MAX:
            return None
        arr = np.full((t.base * V,), np.inf, np.float32)
        occupied = np.nonzero(t.keys[:, 0] != _EMPTY_KEY)[0]
        for slot in occupied:
            c = int(t.keys[slot, 0])
            start, length = (int(x) for x in t.ivals[slot])
            toks = t.child_tok[start:start + length].astype(np.int64)
            arr[c * V + toks] = t.child_logp[start:start + length]
        self._order2_cache = arr
        return arr

    # -- persistence (reference analogue: custom state dict, _lm.py:850-904)
    def state_dict(self) -> Dict[str, np.ndarray]:
        d = {
            "uni_logp": self._uni_logp,
            "meta": np.asarray([self.vocab_size, self.sos, self.max_ngram]),
        }
        for i, t in enumerate(self._ctx_tables):
            d[f"ctx{i}_keys"] = t.keys
            d[f"ctx{i}_fvals"] = t.fvals
            d[f"ctx{i}_ivals"] = t.ivals
            d[f"ctx{i}_tok"] = t.child_tok
            d[f"ctx{i}_logp"] = t.child_logp
            d[f"ctx{i}_meta"] = np.asarray([t.max_probe, t.max_children])
            if getattr(t, "logz_slot", None) is not None:
                d[f"ctx{i}_logz"] = t.logz_slot
        return d

    def load_state_dict(self, d: Dict[str, np.ndarray]) -> None:
        self.vocab_size, self.sos, self.max_ngram = (
            int(x) for x in d["meta"]
        )
        self._uni_logp = np.asarray(d["uni_logp"], np.float32)
        self._sum_u = float(
            np.exp(self._uni_logp[np.isfinite(self._uni_logp)]).sum()
        )

        def load(i):
            t = _CtxTable.__new__(_CtxTable)
            t.keys = np.asarray(d[f"ctx{i}_keys"], np.int32)
            t.fvals = np.asarray(d[f"ctx{i}_fvals"], np.float32)
            t.ivals = np.asarray(d[f"ctx{i}_ivals"], np.int32)
            t.child_tok = np.asarray(d[f"ctx{i}_tok"], np.int32)
            t.child_logp = np.asarray(d[f"ctx{i}_logp"], np.float32)
            t.size, t.n = t.keys.shape
            t.max_probe = int(d[f"ctx{i}_meta"][0])
            t.max_children = int(d[f"ctx{i}_meta"][1])
            t.base = (
                (max(self.vocab_size, self.sos) + 1) if self.sos >= 0 else 0
            )
            t.uni = self._uni_logp
            if f"ctx{i}_logz" in d:
                t.logz_slot = np.asarray(d[f"ctx{i}_logz"], np.float32)
            t._pack()
            return t

        self._ctx_tables = [load(i) for i in range(self.max_ngram - 1)]
        if self.max_ngram > 1 and any(
            getattr(t, "logz_slot", None) is None for t in self._ctx_tables
        ):
            # state dicts saved before stored-logZ: recompute the exact
            # normalizers once at load (same host-side recursion as the
            # build) instead of silently losing the combined-dense fast
            # path for every decode afterwards
            warnings.warn(
                "LookupLanguageModel state dict predates stored "
                "normalizers; recomputing exact logZ tables (one-time, "
                "host-side). Re-save with state_dict() to skip this."
            )
            kid_maps, logb_maps = [], []
            for t in self._ctx_tables:
                kids, logbs = {}, {}
                for slot in np.nonzero(t.keys[:, 0] != _EMPTY_KEY)[0]:
                    ctx = tuple(int(x) for x in t.keys[slot])
                    start, length = (int(x) for x in t.ivals[slot])
                    logbs[ctx] = float(t.fvals[slot])
                    if length:
                        kids[ctx] = [
                            (
                                int(t.child_tok[start + j]),
                                float(t.child_logp[start + j]),
                            )
                            for j in range(length)
                        ]
                kid_maps.append(kids)
                logb_maps.append(logbs)
            self._store_logzs(kid_maps, logb_maps)
        self._combined_cache = None
        self._order2_cache = None

    def score_sequences(self, hist: jax.Array) -> jax.Array:
        """Per-token conditional log-probs ``(S, N)`` of given sequences.

        ``out[t, n] = calc_full_log_probs(hist)[t, n, hist[t, n]]`` but
        computed by probing only the observed next token at each position
        (one batched sparse query over all ``S * N`` positions) instead of
        materializing the ``(S + 1, N, V)`` table — the KenLM-style
        rescoring path (reference users gather from ``calc_full_log_probs``,
        ``_lm.py:792-848``). Sum over ``t`` (masking positions past each
        sequence's length) for sentence scores.
        """
        hist = jnp.asarray(hist)
        if hist.ndim != 2:
            raise RuntimeError("hist must be 2 dimensional")
        S, N = hist.shape
        V = self.vocab_size
        # non-vocab ids (padding, out-of-range) must not alias real tokens
        bad = ((hist < 0) | (hist >= V)).reshape(-1)
        tok = jnp.clip(hist, 0, V - 1).reshape(-1)  # (S*N,)
        uni_at_tok = jnp.take(jnp.asarray(self._uni_logp), tok, axis=0)
        if self.max_ngram == 1 or S == 0:
            out = jnp.where(bad, -jnp.inf, uni_at_tok)
            return out.reshape(S, N)
        # contexts for every position at once: ctx[j, t, n] = hist[t-1-j, n]
        # (sos-padded), flattened to (Ng-1, S*N)
        Ngm1 = self.max_ngram - 1
        pos = (
            jnp.arange(S, dtype=jnp.int32)[None, :]
            - 1
            - jnp.arange(Ngm1, dtype=jnp.int32)[:, None]
        )  # (Ng-1, S)
        gathered = hist[jnp.clip(pos, 0, S - 1)]  # (Ng-1, S, N)
        ctx = jnp.where(
            (pos >= 0)[..., None], gathered.astype(jnp.int32), self.sos
        ).reshape(Ngm1, S * N)
        from . import config as _config

        if self.max_corrections > _config.SPARSE_FUSION_MAX_CORRECTIONS:
            # huge per-context correction lists (e.g. real KenLM-scale
            # unigram contexts) would blow up (S*N, C) intermediates:
            # evaluate the dense conditional row per chunk of positions and
            # gather the one token — bounded by chunk * V
            chunk = max(1, 4096 // max(V, 1)) * 8
            total = S * N
            pad = (-total) % chunk
            ctx_p = jnp.pad(ctx, ((0, 0), (0, pad)))
            tok_p = jnp.pad(tok, (0, pad))
            uni = jnp.asarray(self._uni_logp)

            def do_chunk(args):
                ctx_c, tok_c = args  # (Ng-1, chunk), (chunk,)
                lp = jnp.broadcast_to(uni, (chunk, V))
                for n in range(2, self.max_ngram + 1):
                    ctx_n = ctx_c[: n - 1][::-1].T
                    lp = self._ctx_tables[n - 2].extend_scores(ctx_n, lp)
                return jnp.take_along_axis(lp, tok_c[:, None], 1)[:, 0]

            out = jax.lax.map(
                do_chunk,
                (
                    ctx_p.reshape(Ngm1, -1, chunk).swapaxes(0, 1),
                    tok_p.reshape(-1, chunk),
                ),
            ).reshape(-1)[:total]
        else:
            base, ctoks, cvals, cvalid, _ = self.sparse_corrections(
                ctx, want_logz=False
            )
            match = (ctoks == tok[:, None]) & cvalid  # (S*N, C)
            out = jnp.where(match, cvals, 0.0).sum(1) + jnp.where(
                match.any(1), 0.0, base + uni_at_tok
            )
        out = jnp.where(bad, -jnp.inf, out)
        return out.reshape(S, N)

    def calc_full_log_probs_chunked(
        self, hist: jax.Array, prev: StateDict, chunk_size: int = 32
    ) -> jax.Array:
        """Like :func:`calc_full_log_probs`, but bounding memory by
        processing `chunk_size` history positions at a time (the reference's
        ``calc_full_log_probs_chunked``, ``_lm.py:792-848``)."""
        hist = jnp.asarray(hist)
        S, B = hist.shape
        V = self.vocab_size
        total = S + 1
        pad = (-total) % chunk_size
        idxs = jnp.pad(jnp.arange(total, dtype=jnp.int32), (0, pad))
        chunks = idxs.reshape(-1, chunk_size)

        def do_chunk(ix):
            return jax.vmap(
                lambda t: self.calc_idx_log_probs(hist, prev, t)[0]
            )(ix)

        out = jax.lax.map(do_chunk, chunks)
        return out.reshape(-1, B, V)[:total]
