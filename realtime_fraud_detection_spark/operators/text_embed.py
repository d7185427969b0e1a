"""Text → embedding, in-engine: deterministic hashed char-n-gram signed
projections (feature hashing / the hashing trick), closing the text ANN loop
the way `multimodal.image_embeddings` closes the image one — raw text →
embedding → IVF/PQ/serve runs end-to-end without an external model.

The projection is the classic signed feature hash (Weinberger et al.,
ICML'09): each char n-gram hashes to ONE output dimension (md5 → mod dim)
with a ±1 sign drawn from an independent hash bit, occurrences accumulate,
and the vector is L2-normalized. Inner products of these embeddings
approximate n-gram-profile cosine similarity, which is exactly the signal
the near-dup family (minhash/simhash) ranks by — so ANN recall against
brute force on REAL near-dups is testable without any pretrained weights.

Scale shape: explode(grams) → two hash-keyed aggregations — the same
explode+groupBy form the minhash/simhash signatures use (hash-heavy
per-element work does NOT belong in interpreted HOF lambdas, CLAUDE.md).
Everything is md5-derived and fold-order-fixed → bit-deterministic across
sessions; no Python crossing, no driver state, no model artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint64
from ..functions.text import normalized_text


def hashed_text_embeddings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    gram: int = 3,
    out_col: str = "embedding",
) -> DataFrame:
    """Append an L2-normalized `array<double>` embedding of the document's
    char n-gram profile. Documents whose normalized text is empty get the
    zero vector (cosine 0 to everything — never a spurious neighbor).

    dim=64 matches the fixture embedding width so the hashed vectors feed
    every downstream ANN index (IVF/SQ8/PQ) unchanged.
    """
    # stage the NORMALIZED text as a bound column before the generator
    # (shingle_table's two-select idiom): expressions inside a generator
    # re-evaluate per OUTPUT element, so the lower+regex normalize must
    # not ride inside it — only the cheap substring transform does. The
    # two references to `_t` (length + the lambda) keep CollapseProject
    # from re-inlining the normalize (r13: gram→agg stage 1.4-1.8 s →
    # 0.9-1.4 s at sf0.1, bit-identical).
    staged = df.select(
        F.col(id_col),
        F.trim(normalized_text(F.col(text_col))).alias("_t"),
    )
    n_grams = F.greatest(F.lit(1), F.length(F.col("_t")) - (gram - 1))
    grams = staged.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: F.substring(F.col("_t"), i, gram),
            )
        ).alias("_g"),
    ).filter(F.col("_g") != "")
    h = md5_bigint64(F.col("_g"))
    # low bits pick the dimension, bit 32 the sign — independent coins
    per_dim = (
        grams.select(
            id_col,
            F.pmod(h, F.lit(dim)).alias("_d"),
            F.when(F.getbit(h, F.lit(32)) == 1, -1).otherwise(1).alias("_s"),
        )
        .groupBy(id_col, "_d")
        .agg(F.sum("_s").cast("double").alias("_v"))
    )
    sparse = per_dim.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("_d", "_v"))).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("_m")[i], F.lit(0.0)),
    )
    # norm folds left-to-right over the fixed index order — deterministic;
    # dim elements per doc, so the interpreted HOF cost is bounded
    dense = sparse.select(id_col, vec.alias("_vec")).select(
        id_col,
        "_vec",
        F.sqrt(
            F.aggregate(F.col("_vec"), F.lit(0.0), lambda a, x: a + x * x)
        ).alias("_n"),
    )
    emb = dense.select(
        id_col,
        F.when(
            F.col("_n") > 0.0,
            F.transform(F.col("_vec"), lambda x: x / F.col("_n")),
        )
        .otherwise(F.col("_vec"))
        .alias(out_col),
    )
    zero = F.array_repeat(F.lit(0.0), dim)
    return df.join(emb, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), zero)
    )
