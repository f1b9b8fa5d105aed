"""Text-embedding stage: deterministic feature-hashing embedder actor pool.

The reference's embedding pass (S8/T5) fetches Function/Method rows,
batch-embeds snippets with a loaded model and writes a vector store in
fixed-size batches (``graph_updater.py:2051-2181``, batch size
``config.py:278``). The Ray-native shape is a stateful actor-pool
``map_batches`` stage: model/projection state built ONCE per actor in
``__init__``, vectorized batch inference in ``__call__``, output written as
a partitioned embeddings table consumed by the kNN / near-dup operators.

Two embedder tiers share one stage contract ((id, text) → (id, embedding),
L2-normalized float32 list):

- :class:`FeatureHashEmbedder` — deterministic feature-hashing vectorizer
  (word uni+bigram hashing with the sign trick), the default in this
  container: no model weights exist here, and it is the pinnable function
  the tests/oracles check.
- :class:`SentenceModelEmbedder` — the REAL learned-model path,
  import-gated on ``sentence_transformers``/``torch``: model loaded ONCE
  per actor in ``__init__`` (the reference's UniXcoder load,
  ``graph_updater.py:2051-2181``), batched ``encode`` in ``__call__``.
  ``NotImplementedError`` is reachable only from the ImportError handler;
  when the lib exists the stage is drop-in (`embed_documents(
  embedder="model", model_name=...)`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from code_graph_rag_ray.functions.hashing import stable_hash_array
from code_graph_rag_ray.stages.extract import _tokenize


class FeatureHashEmbedder:
    """Actor-pool stage: (id, text) batches → (id, embedding) rows.

    Vectorized per batch: one flat tokenization (Arrow split + offsets),
    one stable-hash pass over all tokens, bigram hashes by combining
    adjacent token hashes, then a single ``np.add.at`` scatter into the
    (docs × dim) matrix with the hashing-trick sign bit.
    """

    def __init__(self, dim: int = 64, id_col: str = "doc_id", text_col: str = "text",
                 hash_mode: str = "stable"):
        self.dim = dim
        self.id_col = id_col
        self.text_col = text_col
        self.hash_mode = hash_mode
        if hash_mode == "md5":
            # AUDIT mode: md5-low32 token hashes (< 2^32) so every hash —
            # including the bigram combine, whose product with a 32-bit
            # multiplier stays < 2^64, no wraparound — is recomputable in
            # DuckDB, making the resulting vectors bit-exact oracle-checkable
            # (integer bucket counts → exact-rounded sqrt/divide/float32).
            # Sign comes from bit 31 (the top bit of an md5-low32 value).
            self._mult = np.uint64(0x9E3779B9)
            self._sign_bit = np.uint64(31)
        else:
            self._mult = np.uint64(0x9E3779B97F4A7C15)
            self._sign_bit = np.uint64(63)

    def _accumulate(self, mat: np.ndarray, h: np.ndarray, rows: np.ndarray) -> None:
        idx = (h % np.uint64(self.dim)).astype(np.int64)
        sign = np.where((h >> self._sign_bit) & np.uint64(1), -1.0, 1.0)
        np.add.at(mat, (rows, idx), sign)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mat = np.zeros((n, self.dim), dtype=np.float64)
        flat, row_idx, _offsets = _tokenize(batch[self.text_col])
        if len(flat):
            # drop empty tokens (split of "" yields one empty string —
            # an empty document must embed to the zero vector)
            import pyarrow.compute as pc

            lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            keep = np.flatnonzero(lens > 0)
            flat = pc.take(flat, pa.array(keep, pa.int64()))
            row_idx = row_idx[keep]
        if len(flat):
            if self.hash_mode == "md5":
                from code_graph_rag_ray.functions.hashing import md5_low32_array

                h = md5_low32_array(flat).astype(np.uint64)
            else:
                h = stable_hash_array(flat)
            self._accumulate(mat, h, row_idx)
            # word bigrams: combine adjacent token hashes within a row
            same = row_idx[:-1] == row_idx[1:]
            h2 = (h[:-1] * self._mult + h[1:])[same]
            self._accumulate(mat, h2, row_idx[:-1][same])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat /= norms
        return pa.table(
            {self.id_col: batch[self.id_col],
             "embedding": pa.array(list(mat.astype(np.float32)),
                                   pa.list_(pa.float32()))}
        )


class SentenceModelEmbedder:  # pragma: no cover - model libs not in container
    """Actor-pool stage around a REAL sentence-embedding model.

    Import-gated, not stubbed: when ``sentence_transformers`` is
    importable the model loads once per actor and ``__call__`` runs
    batched inference; the only unreachable-with-libs path is the
    ImportError → NotImplementedError handler. Same output contract as
    :class:`FeatureHashEmbedder` (L2-normalized float32 list column), so
    every downstream ANN / near-dup operator is unchanged.
    """

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
                 id_col: str = "doc_id", text_col: str = "text",
                 device: str = "cpu"):
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:
            raise NotImplementedError(
                "sentence_transformers not available in this environment; "
                "use embedder='hash' (FeatureHashEmbedder)"
            ) from e
        self.id_col = id_col
        self.text_col = text_col
        # once per actor — the expensive state the pool exists for
        self.model = SentenceTransformer(model_name, device=device)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        mat = self.model.encode(
            texts, convert_to_numpy=True, normalize_embeddings=True,
            show_progress_bar=False,
        ).astype(np.float32)
        return pa.table(
            {self.id_col: batch[self.id_col],
             "embedding": pa.array(list(mat), pa.list_(pa.float32()))}
        )


def embed_documents(
    ds: Dataset,
    *,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | None = 2,
    batch_size: int | None = 256,
    num_cpus: float = 1,
    hash_mode: str = "stable",
    embedder: str = "hash",
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
) -> Dataset:
    """Wire the embedding stage as a bounded actor pool.

    ``embedder="hash"`` (default) is the deterministic feature-hashing
    vectorizer; ``"model"`` selects the import-gated real-model actor
    (``model_name``, loaded once per actor — raise ``concurrency`` /
    ``num_cpus`` to size the pool for inference). ``concurrency=None``
    degrades to stateless tasks (fine for the hashing embedder; keep the
    pool when the per-actor state is a real model). ``batch_size`` bounds
    per-inference memory — the analog of the reference's batches-of-50
    store writes.
    """
    if embedder == "model":  # pragma: no cover - model libs not in container
        return ds.map_batches(
            SentenceModelEmbedder,
            fn_constructor_args=(model_name, id_col, text_col),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or 2,
            num_cpus=num_cpus,
        )
    if embedder != "hash":
        raise ValueError(f"unknown embedder {embedder!r}")
    if concurrency is None:
        fn = FeatureHashEmbedder(dim, id_col, text_col, hash_mode)
        return ds.map_batches(
            lambda b: fn(b), batch_format="pyarrow", batch_size=batch_size
        )
    return ds.map_batches(
        FeatureHashEmbedder,
        fn_constructor_args=(dim, id_col, text_col, hash_mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
