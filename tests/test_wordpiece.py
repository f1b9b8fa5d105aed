"""MaxMatch/WordPiece-style tokenizer tests (stages/wordpiece.py)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.wordpiece import (
    _greedy_counts,
    wordpiece_tokenize,
    wordpiece_vocab,
)


def _docs(rows):
    return rd.from_arrow(
        pa.Table.from_pylist(
            [{"doc_id": i, "text": t} for i, t in rows],
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        )
    )


def test_vocab_counts_occurrence_positions_weighted_by_word_freq():
    # "aaa" x2 docs: substring "aa" occurs at 2 positions per word
    ds = _docs([(0, "aaa"), (1, "aaa")])
    out = (
        wordpiece_vocab(ds, lmax=3, min_freq=2, top_k=10)
        .to_pandas()
        .set_index("piece")["freq"]
        .to_dict()
    )
    assert out == {"aa": 4, "aaa": 2}


def test_vocab_threshold_and_deterministic_tie_order():
    ds = _docs([(0, "abc xyz abc")])
    out = wordpiece_vocab(ds, lmax=3, min_freq=2, top_k=2).to_pandas()
    # only the abc substrings reach freq 2; ties break piece-ascending
    assert list(out["piece"]) == ["ab", "abc"] or list(out["piece"]) == sorted(
        out["piece"]
    )[:2]
    assert (out["freq"] == 2).all()


def test_greedy_longest_match_and_fallback():
    by_len = {2: {"ab", "cd"}, 3: {"abc"}}
    # "abcd" → "abc" (greedy longest) + fallback "d" — NOT "ab"+"cd"
    assert _greedy_counts("abcd", by_len, lmax=3) == (2, 1)
    # all fallback when nothing matches
    assert _greedy_counts("zz", by_len, lmax=3) == (2, 2)
    assert _greedy_counts("ab", by_len, lmax=3) == (1, 0)


def test_tokenize_counts_per_doc_and_zero_word_docs():
    vocab = pa.table(
        {"piece": pa.array(["abc", "ab"]), "freq": pa.array([5, 5], pa.int64())}
    )
    ds = _docs([(0, "abcd ab"), (1, "...")])  # doc 1 has no alnum words
    out = (
        wordpiece_tokenize(ds, vocab, lmax=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_words"]) == [2, 0]
    # "abcd" → abc + d (2 tokens, 1 fallback); "ab" → ab (1 token)
    assert list(out["n_wp_tokens"]) == [3, 0]
    assert list(out["n_fallback"]) == [1, 0]


def test_fertility_catalog_metrics_integer_exact(tmp_path):
    import pyarrow.parquet as pq

    from code_graph_rag_ray.pipelines.catalog import corpus_wordpiece_fertility

    t = pa.Table.from_pylist(
        [
            {"doc_id": 0, "text": "merge merge merge merge merge", "lang": "en"},
            {"doc_id": 1, "text": "zzz qqq", "lang": "fr"},
        ],
        schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
        ),
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        corpus_wordpiece_fertility(str(tmp_path))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    # en: vocab covers "merge" fully via mined pieces (freq 5 >= 5):
    # greedy takes "merge" (len 5) as one token per word, zero fallback
    assert out.loc["en", "n_words"] == 5
    assert out.loc["en", "fertility_micro"] == 1_000_000
    assert out.loc["en", "fallback_rate_micro"] == 0
    # fr: no piece reaches min_freq except merge substrings; zzz/qqq have
    # substrings below threshold -> all single-char fallback (3+3 tokens)
    assert out.loc["fr", "n_wp_tokens"] == 6
    assert out.loc["fr", "fallback_rate_micro"] == 1_000_000


def test_tokenize_layout_invariance():
    vocab_src = _docs([(0, "merge merge merge batch batch batch")])
    vocab = pa.Table.from_pylist(
        wordpiece_vocab(vocab_src, lmax=4, min_freq=3, top_k=16).take_all(),
        schema=pa.schema([("piece", pa.string()), ("freq", pa.int64())]),
    )
    rows = [(i, "merge batch stream xq") for i in range(20)]
    one = wordpiece_tokenize(_docs(rows), vocab, lmax=4).to_pandas()
    many = wordpiece_tokenize(
        _docs(rows).repartition(7), vocab, lmax=4
    ).to_pandas()
    key = ["doc_id", "n_words", "n_wp_tokens", "n_fallback"]
    a = one[key].sort_values("doc_id").reset_index(drop=True)
    b = many[key].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_vocab_non_ascii_words_fall_back_correctly():
    """A custom token_split can yield non-ASCII words; the byte-window
    vectorization must detect the char/byte mismatch and fall back to the
    per-word path with identical counting semantics."""
    ds = _docs([(0, "héllo héllo naïve")])
    out = (
        wordpiece_vocab(ds, lmax=3, min_freq=2, top_k=50,
                        token_split="[^a-zà-ÿ0-9]+")
        .to_pandas()
        .set_index("piece")["freq"]
        .to_dict()
    )
    # substrings of "héllo" (freq 2 per occurrence position)
    assert out["hé"] == 2 and out["hél"] == 2 and out["ll"] == 2
    assert "na" not in out  # freq 1 < min_freq
