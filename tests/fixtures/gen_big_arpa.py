"""Deterministic 5-gram / 10k-vocab ARPA acceptance fixture generator.

The reference anchors ``LookupLanguageModel`` against KenLM sentence scores
on a real 5-gram LM (reference ``tests/test_lm.py:367-421``), but the ARPA
file itself (``tests/republic/republic.arpa``) is absent from the checkout
and rebuilding it needs KenLM + the corpus (no egress here). This generator
replaces that anchor with a committed fixture at comparable scale
(VERDICT r2 next-step #7): a 5-gram backoff LM over a 10,240-token vocab
(+ ``<s>``), exercising

- every backoff order (sparse orders 2-5 force chains 5->4->3->2->1);
- pruned patterns: higher-order grams whose (n-1)-gram context is absent
  (implicit zero backoff on the missing node) and mid-order grams written
  WITHOUT a trailing backoff weight (ARPA's omitted-backoff shorthand);
- ``<unk>`` / ``</s>`` targets and ``<s>``-containing contexts, with the
  conventional ``-99`` log10-prob ``<s>`` unigram;
- positive backoff weights (KenLM emits them; sign handling matters);
- a Zipf-skewed context distribution so real shared context tables form.

Regenerate with ``python tests/fixtures/gen_big_arpa.py`` (pure function of
SEED; the committed ``big5.arpa.gz`` must equal its output).
"""

import gzip
import os

import numpy as np

V = 10240  # regular token ids 0..V-1; <s> gets id V
SOS = V
SEED = 20260819
COUNTS = {2: 30000, 3: 25000, 4: 15000, 5: 8000}
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "big5.arpa.gz")


def token_name(i: int) -> str:
    if i == SOS:
        return "<s>"
    if i == 0:
        return "<unk>"
    if i == 1:
        return "</s>"
    return f"w{i:05d}"


def token2id() -> dict:
    d = {token_name(i): i for i in range(V)}
    d["<s>"] = SOS
    return d


def _zipf_ids(rng, size, hot=2048):
    """Mostly ids from a Zipf-skewed hot set, sometimes uniform over V."""
    z = rng.zipf(1.3, size=size)
    ids = np.minimum(z - 1, hot - 1).astype(np.int64)
    uniform = rng.randint(0, V, size)
    take_uniform = rng.rand(size) < 0.15
    return np.where(take_uniform, uniform, ids)


def gen_grams(seed=SEED):
    """Returns ``{order: {key: (log10p, log10b or None)}}`` with int-id keys
    (order-1 keys are plain ints; ``None`` backoff means "omit the field")."""
    rng = np.random.RandomState(seed)
    grams = {1: {}}
    for w in range(V):
        grams[1][w] = (
            round(float(-rng.rand() * 6 - 0.05), 4),
            round(float(rng.rand() * 1.4 - 1.1), 4),  # some positive
        )
    grams[1][SOS] = (-99.0, round(float(-rng.rand()), 4))
    for n in range(2, 6):
        want = COUNTS[n]
        d = {}
        # batched rejection sampling until the order has `want` unique keys
        while len(d) < want:
            m = want - len(d) + 64
            ctx_cols = [_zipf_ids(rng, m) for _ in range(n - 1)]
            # sprinkle <s> into the leftmost context slot
            sos_mask = rng.rand(m) < 0.08
            ctx_cols[0] = np.where(sos_mask, SOS, ctx_cols[0])
            last = _zipf_ids(rng, m)
            # some </s> / <unk> targets
            last = np.where(rng.rand(m) < 0.05, 1, last)
            last = np.where(rng.rand(m) < 0.02, 0, last)
            for row in range(m):
                if len(d) >= want:
                    break
                key = tuple(int(c[row]) for c in ctx_cols) + (int(last[row]),)
                if key in d:
                    continue
                logp = round(float(-rng.rand() * 7 - 0.05), 4)
                if n == 5:
                    d[key] = (logp, None)
                else:
                    # ~20% written without a backoff field (pruned pattern:
                    # implicit zero backoff)
                    logb = (
                        None
                        if rng.rand() < 0.2
                        else round(float(rng.rand() * 1.2 - 0.9), 4)
                    )
                    d[key] = (logp, logb)
        grams[n] = d
    return grams


def write_arpa(grams, path=OUT):
    with gzip.open(path, "wt", newline="\n") as f:
        f.write("\\data\\\n")
        for n in sorted(grams):
            f.write(f"ngram {n}={len(grams[n])}\n")
        f.write("\n")
        for n in sorted(grams):
            f.write(f"\\{n}-grams:\n")
            for key, (logp, logb) in grams[n].items():
                toks = (
                    token_name(key)
                    if n == 1
                    else " ".join(token_name(k) for k in key)
                )
                if logb is None:
                    f.write(f"{logp} {toks}\n")
                else:
                    f.write(f"{logp} {toks} {logb}\n")
            f.write("\n")
        f.write("\\end\\\n")


def main():
    write_arpa(gen_grams())
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
