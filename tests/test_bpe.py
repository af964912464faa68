"""Distributed BPE training vs a pure-Python reference (Sennrich et
al. 2016 learn_bpe semantics: most-frequent adjacent pair per round,
lexicographic tiebreak, leftmost-first overlap resolution)."""

from __future__ import annotations

import re
from collections import Counter

from fegis_spark.operators.bpe import (
    EOW,
    encode_with_merges,
    train_bpe,
    words_to_symbols,
)

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "the lowest newest widest low"),
]


def py_words(text):
    return [t for t in re.split(r"[^0-9a-z]+", text.lower()) if t]


def py_train(corpus, num_merges, min_pair_count=2):
    seqs = []
    for _, text in corpus:
        for w in py_words(text):
            s = list(w)
            s[-1] += EOW
            seqs.append(s)
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_seqs = []
        for s in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_seqs.append(out)
        seqs = new_seqs
    return merges


def py_encode(text, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    out = []
    for w in py_words(text):
        seq = list(w)
        seq[-1] += EOW
        while len(seq) >= 2:
            best, bi = None, -1
            for i in range(len(seq) - 1):
                r = ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            seq[bi : bi + 2] = [seq[bi] + seq[bi + 1]]
        out.extend(seq)
    return out


def test_train_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = train_bpe(df, "text", "doc_id", num_merges=12)
    exp = py_train(CORPUS, 12)
    assert got == exp
    # the classic demo corpus must actually learn multi-char merges
    assert ("est" + EOW) in {a + b for a, b in got} | {a for a, _ in got} | {
        b for _, b in got
    } or any(len(a + b) > 2 for a, b in got)


def test_encode_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = train_bpe(df, "text", "doc_id", num_merges=10)
    enc = encode_with_merges(df, "text", "doc_id", merges)
    got = {r["doc"]: (list(r["tokens"]), r["n_tokens"]) for r in enc.collect()}
    for doc_id, text in CORPUS:
        exp = py_encode(text, merges)
        assert got[doc_id] == (exp, len(exp)), (doc_id, got[doc_id], exp)
    # compression: learned merges shorten the char-level stream
    n_chars = sum(len(w) + 1 for _, t in CORPUS for w in py_words(t))
    n_toks = sum(v[1] for v in got.values())
    assert n_toks < n_chars


def test_words_to_symbols_shape(spark):
    df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    rows = sorted(
        tuple(r["syms"]) for r in words_to_symbols(df, "text", "doc_id").collect()
    )
    assert rows == [("a", "b" + EOW), ("c", "d" + EOW)]


def test_early_stop_on_min_pair_count(spark):
    # every word unique and short: after few merges no pair recurs
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    merges = train_bpe(df, "text", "doc_id", num_merges=50, min_pair_count=2)
    assert merges == py_train([(1, "ab cd ef")], 50)


def test_deep_merge_table_matches_reference(spark):
    """>= 100 merges on a constructed tie-heavy corpus (r5 verdict #7):
    a 3-letter alphabet makes pair counts collide constantly, so any
    tiebreak drift (lexicographic pair order, leftmost-first overlap
    application) between the distributed argmax and the sequential
    reference surfaces DEEP in the merge table, where early divergence
    compounds. Corpus is seeded-deterministic; every word repeats so
    min_pair_count=2 never stalls early."""
    import random

    rng = random.Random(20260814)
    words = {
        "".join(rng.choice("abc") for _ in range(rng.randint(4, 9)))
        for _ in range(70)
    }
    bag = [w for w in sorted(words) for _ in range(rng.randint(2, 4))]
    rng.shuffle(bag)
    corpus = [(i, " ".join(bag[i * 20 : (i + 1) * 20])) for i in range(len(bag) // 20 + 1)]
    corpus = [(i, t) for i, t in corpus if t]
    exp = py_train(corpus, 110)
    assert len(exp) >= 100, f"constructed corpus sustains only {len(exp)} merges"
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = train_bpe(df, "text", "doc_id", num_merges=110)
    assert got == exp, next(
        ((i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e),
        ("length", len(got), len(exp)),
    )
    # and encoding with the deep table still matches token-for-token
    enc = encode_with_merges(df, "text", "doc_id", got)
    got_tok = {r["doc"]: list(r["tokens"]) for r in enc.collect()}
    for doc_id, text in corpus:
        assert got_tok[doc_id] == py_encode(text, got), doc_id


def test_bpe_property_random_corpora(spark):
    """Derandomized hypothesis sweep: distributed merge learning equals
    the sequential reference on generated corpora (repeated words, CJK
    single-char tokens, digits) — one example per corpus shape to keep
    the Spark-round cost bounded."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    WORD = st.text(alphabet="abc的1", min_size=1, max_size=5)

    @settings(derandomize=True, max_examples=2, deadline=None)
    @given(st.lists(st.lists(WORD, min_size=1, max_size=8), min_size=2, max_size=5))
    def run(docs):
        corpus = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        assert train_bpe(df, "text", "doc_id", num_merges=5) == py_train(corpus, 5)

    run()


def py_encode_sequential(text, merges):
    """Rank-order sequential application — the semantics the DuckDB
    oracle of bpe_train_encode replays (each merge applied
    exhaustively left-to-right before the next)."""
    out = []
    for w in py_words(text):
        seq = list(w)
        seq[-1] += EOW
        for a, b in merges:
            nxt, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(seq[i])
                    i += 1
            seq = nxt
        out.extend(seq)
    return out


def test_sequential_equals_priority_encode(spark):
    """The equivalence the bpe_train_encode oracle rests on: for a
    WELL-FORMED merge table (every merge's operands are products of
    strictly earlier merges — what train_bpe produces by
    construction), sequential rank-order application equals the
    priority-greedy encode. Checked on the training corpus, on unseen
    words, and on adversarial overlap shapes (aaa-runs, nested
    merges)."""
    merges = py_train(CORPUS, 12, min_pair_count=1)
    probes = [text for _, text in CORPUS] + [
        "lowest newest widest the low",
        "looow lowlow newestnewest",
        "aaa aaaa aaaaa",
        "wwww eeee ssss tttt",
        "lll ooo www",
        "neweste stnewest wne",
    ]
    for text in probes:
        assert py_encode_sequential(text, merges) == py_encode(text, merges), text
    # and on a second table trained on an aaa-heavy corpus (maximal
    # overlap stress: merges like (a,a) then (aa,a) / (aa,aa))
    aaa = [(1, "aaaa aaaaa aaa"), (2, "aaaaaa aa aaaa"), (3, "aaa aaa aaa")]
    m2 = py_train(aaa, 6, min_pair_count=1)
    for text in ["a aa aaa aaaa aaaaa aaaaaa aaaaaaa aaaaaaaa"]:
        assert py_encode_sequential(text, m2) == py_encode(text, m2), (text, m2)
