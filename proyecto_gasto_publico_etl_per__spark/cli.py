"""CLI mirroring the reference's entry points.

Reference commands (README.md:129-156):

    python etl/transformar_mensual.py [years] [--overwrite]
    python etl/cargar_postgres.py [years] [--batch N] ...

Here:

    python -m proyecto_gasto_publico_etl_per__spark.cli transform RAW.csv OUT_DIR [--overwrite]
    python -m proyecto_gasto_publico_etl_per__spark.cli load NORMALIZED_DIR WAREHOUSE
    python -m proyecto_gasto_publico_etl_per__spark.cli query WAREHOUSE {q1..q7} [params]

The batch/subbatch/resume knobs of the reference's loader do not exist:
partitioned execution, task retry, and idempotent append make them moot
(SURVEY.md §4).
"""

from __future__ import annotations

import argparse

from .plans import mef_pipeline
from .plans import queries as Q
from .session import get_spark
from .operators.skew import pin


def _warn_cross_modality(media: str, *flags) -> None:
    """Print a warning for each explicitly-set knob that does not apply
    to the selected --media (review r12: never silently discard)."""
    for flag, val in flags:
        if val is not None:
            print(
                f"warning: {flag} does not apply to --media {media} "
                "— ignored"
            )


def _text_index_deltas(index_dir: str) -> list[int]:
    """delta=N numbers present under a text index dir, ascending."""
    import os
    import re

    try:
        names = os.listdir(index_dir)
    except FileNotFoundError:
        return []
    return sorted(
        int(m.group(1))
        for name in names
        if (m := re.fullmatch(r"delta=(\d+)", name))
    )


def _text_index_epochs(index_dir: str) -> list[int]:
    """epoch=N numbers present under a text index dir, ascending —
    the zone-set layout `streaming.incremental.bm25_index_ingest`
    writes (one root per micro-batch).  Round 15: the CLI resolver
    recognizes them so a STREAMED index serves and compacts through
    the same text-search / text-index-compact commands as a batch one
    (previously 'no text index here')."""
    import os
    import re

    try:
        names = os.listdir(index_dir)
    except FileNotFoundError:
        return []
    return sorted(
        int(m.group(1))
        for name in names
        if (m := re.fullmatch(r"epoch=(\d+)", name))
    )


def _is_bare_zone_root(path: str) -> bool:
    """True when ``path`` is itself a zone root (postings/ directly
    under it — e.g. a compacted out_dir), as opposed to a structured
    index dir holding base/ and delta=N/ roots.  The ONE probe the
    build/append guards and the roots resolver all share, so a zone
    layout change lands in one place (r14 review)."""
    import os

    return os.path.isdir(f"{path}/postings")


def _text_index_roots(index_dir: str) -> list[str]:
    """base + delta=N + epoch=N zone roots of a text index dir
    (deltas/epochs in append order); a bare zone root (postings/
    present, no base/) serves as-is — so `text-search` also works
    directly on a compacted out_dir, and (round 15) a STREAMED index
    (`bm25_index_ingest`'s epoch=N layout) serves and compacts through
    the same commands.  A directory that is BOTH (postings/ alongside
    structured roots) is ambiguous — serving only the bare zones would
    silently drop the structured roots' documents (r13 review) — so it
    errors."""
    import os

    bare = _is_bare_zone_root(index_dir)
    structured = []
    if os.path.isdir(f"{index_dir}/base"):
        structured.append(f"{index_dir}/base")
    structured += [
        f"{index_dir}/delta={n}" for n in _text_index_deltas(index_dir)
    ]
    structured += [
        f"{index_dir}/epoch={n}" for n in _text_index_epochs(index_dir)
    ]
    if bare and structured:
        raise SystemExit(
            f"{index_dir}: ambiguous text index — it is a bare zone "
            "root (postings/) AND contains structured roots "
            f"({[os.path.basename(r) for r in structured]}). Serving "
            "either subset alone would silently drop the other's "
            "documents; separate them into distinct directories."
        )
    if bare:
        return [index_dir]
    if not structured:
        raise SystemExit(
            f"{index_dir}: no text index here (expected base/, "
            "delta=N/, epoch=N/, or a bare zone root with postings/)"
        )
    return structured


def _numbered_subdirs(path: str, prefix: str) -> list[int]:
    """``<prefix>=N`` numbers directly under ``path``, ascending."""
    import os
    import re

    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(
        int(m.group(1))
        for name in names
        if (m := re.fullmatch(rf"{prefix}=(\d+)", name))
    )


def _agg_zone_roots(agg_dir: str) -> list[str]:
    """base + delta=N + epoch=N roots of an aggregate-zone dir (the
    `_text_index_roots` layout applied to the rollup lane — epoch=N is
    what `streaming.incremental.agg_zone_ingest` writes, so a streamed
    rollup serves and compacts through the same commands).  A bare
    zone root (spec.json directly under the dir — e.g. a compacted
    out_dir) serves as-is; bare + structured together is ambiguous and
    errors, exactly like the text-index resolver."""
    import os

    bare = os.path.isfile(f"{agg_dir}/spec.json")
    structured = []
    if os.path.isdir(f"{agg_dir}/base"):
        structured.append(f"{agg_dir}/base")
    structured += [
        f"{agg_dir}/delta={n}" for n in _numbered_subdirs(agg_dir, "delta")
    ]
    structured += [
        f"{agg_dir}/epoch={n}" for n in _numbered_subdirs(agg_dir, "epoch")
    ]
    if bare and structured:
        raise SystemExit(
            f"{agg_dir}: ambiguous aggregate-zone dir — it is a bare "
            "zone root (spec.json) AND contains structured roots "
            f"({[os.path.basename(r) for r in structured]}). Serving "
            "either subset alone would silently drop the other's "
            "rows; separate them into distinct directories."
        )
    if bare:
        return [agg_dir]
    if not structured:
        raise SystemExit(
            f"{agg_dir}: no aggregate zones here (expected base/, "
            "delta=N/, epoch=N/, or a bare zone root with spec.json)"
        )
    return structured


def _split_cols(s: str) -> list[str]:
    return [c for c in s.split(",") if c]


def _resolve_ann_knobs(
    spark, base, manifest, k, rerank, nprobe, target_recall
):
    """The --target-recall resolution shared by ann-search and
    hybrid-search: returns (nprobe, k, rerank).  With no target, the
    CLI knobs pass through.  With a target, the manifest's MEASURED
    recall ladder resolves nprobe (`similarity.resolve_nprobe`), the
    ladder's measured (k, rerank) pin over the CLI's (serving at
    different knobs voids the measurement — printed when they differ),
    and the staleness anchor is enforced: an append-grown index
    refuses a ladder it has outgrown, a delete-shrunk one warns (the
    conservative direction)."""
    from .operators import similarity

    if target_recall is None:
        return nprobe, k, rerank
    ladder = manifest.get("recall_ladder")
    if not ladder:
        raise SystemExit(
            "--target-recall needs a measured recall_ladder in "
            "the index manifest; write one with "
            "tools/ann_knob_sweep.py --write-manifest "
            f"{base}"
        )
    ladder_k = int(ladder[0].get("k", k))
    ladder_rerank = int(manifest.get("rerank", rerank))
    if (k, rerank) != (ladder_k, ladder_rerank):
        print(
            f"--target-recall pins k={ladder_k} "
            f"rerank={ladder_rerank} (the knobs the ladder was "
            f"measured at); ignoring --k={k} --rerank={rerank} "
            "— re-measure the ladder at those knobs to serve "
            "them with a recall target"
        )
        k, rerank = ladder_k, ladder_rerank
    # staleness guard: appends grow the index without re-measuring;
    # refuse to resolve from a ladder the index has outgrown
    # (similarity.LADDER_MAX_GROWTH_FRAC).  The count job only runs
    # when there IS an anchor to compare against — pre-anchor
    # manifests must not pay a wasted Spark action on every serve
    anchor = manifest.get("ladder_index_n")
    index_n = (
        spark.read.parquet(f"{base}/index_assigned").count()
        if anchor is not None
        else None
    )
    nprobe = similarity.resolve_nprobe(
        ladder,
        target_recall,
        ladder_index_n=anchor,
        index_n=index_n,
    )
    print(
        f"target_recall={target_recall} -> nprobe={nprobe} "
        "(from the manifest's measured ladder)"
    )
    return nprobe, k, rerank


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="gasto-engine")
    sub = parser.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("transform", help="raw CSV (file or dir) → normalized parquet")
    t.add_argument("raw_csv")
    t.add_argument("out_dir")
    t.add_argument(
        "years", nargs="*", type=int,
        help="restrict a raw DIRECTORY to these years (reference CLI parity)",
    )
    t.add_argument("--overwrite", action="store_true")

    ld = sub.add_parser("load", help="normalized parquet → star warehouse")
    ld.add_argument("normalized_dir")
    ld.add_argument("warehouse")
    ld.add_argument(
        "years", nargs="*", type=int,
        help="load only these years (partition-pruned read, ref CLI parity)",
    )
    ld.add_argument(
        "--validate", action="store_true",
        help="fail loudly if the normalized input violates the standard "
             "record invariants (one extra scan)",
    )

    ins = sub.add_parser(
        "inspect",
        help="first N rows of a raw CSV (the reference's documented-but-"
             "absent revision_contenido.py, README.md:159-167)",
    )
    ins.add_argument("raw_csv")
    ins.add_argument("--rows", type=int, default=100)

    sn = sub.add_parser(
        "sniff",
        help="separator/encoding detection (the reference's documented-"
             "but-absent comprobacion.py, README.md:190-196)",
    )
    sn.add_argument("raw_csv")

    s = sub.add_parser(
        "sql",
        help="run ad-hoc SQL over the registered warehouse views "
             "(vw_gasto_mensual / vw_gasto_agregado_{mensual,anual}) — the "
             "reference's psql-against-views workflow "
             "(CreacionDeUsuariosyVistas.sql grants SELECT on exactly these)",
    )
    s.add_argument("warehouse")
    s.add_argument("statement")
    s.add_argument("--rows", type=int, default=50)

    r = sub.add_parser(
        "refresh-agg",
        help="materialize / incrementally refresh the monthly serving "
             "aggregate (partition-scoped when years are given)",
    )
    r.add_argument("warehouse")
    r.add_argument("agg_path")
    r.add_argument("years", nargs="*", type=int)

    cb = sub.add_parser(
        "corpus-build",
        help="end-to-end training-corpus build: profile -> clean (quality/"
             "lang/dedup) -> leakage-free splits -> packed sequences",
    )
    cb.add_argument("sf_dir")
    cb.add_argument("out_dir")
    cb.add_argument("--lang", default="en")
    cb.add_argument("--val-fraction", type=float, default=0.01)
    cb.add_argument("--test-fraction", type=float, default=0.01)
    cb.add_argument(
        "--classifier-model",
        default=None,
        help="model-store path of a trained quality classifier "
             "(plans.corpus_pipeline.train_quality_classifier); adds a "
             "learned p_keep gate on top of the heuristic gates",
    )
    cb.add_argument("--classifier-threshold", type=float, default=0.5)
    cb.add_argument(
        "--dsir-target-source",
        action="append",
        default=None,
        dest="dsir_target_sources",
        help="repeatable; sources whose docs form the DSIR target-domain "
             "exemplar — other train docs are importance-scored against "
             "them and only the top --dsir-keep-frac survive",
    )
    cb.add_argument("--dsir-keep-frac", type=float, default=0.5)
    cb.add_argument(
        "--dsir-sample-permille",
        type=int,
        default=None,
        help="explicit hash-sample permille for the DSIR threshold "
             "quantile (1000 = exact full-corpus collect, the "
             "small-scale opt-in); default auto-bounds the driver-side "
             "sample to ~256k rows regardless of corpus size",
    )

    ab = sub.add_parser(
        "ann-build-index",
        help="build + persist the IVF-PQ serving index over an "
             "embeddings table: centroids + codebook (model store) and "
             "coarse-assignment + PQ-code parquet zones",
    )
    ab.add_argument("sf_dir")
    ab.add_argument("index_dir")
    ab.add_argument("--n-centroids", type=int, default=16)
    ab.add_argument(
        "--m", type=int, default=16,
        help="PQ subspaces; narrower subvectors quantize better "
             "(recall-measured default, see SCALE.md)",
    )
    ab.add_argument("--n-codes", type=int, default=16)

    aap = sub.add_parser(
        "ann-append-index",
        help="incremental index refresh: encode NEW vectors (vec_id >= "
             "--from-id) with the index's frozen artifacts and append "
             "them to the persisted zones — never re-encodes the "
             "existing corpus, never re-derives the quantizer",
    )
    aap.add_argument("sf_dir")
    aap.add_argument("index_dir")
    aap.add_argument(
        "--from-id", type=int, required=True,
        help="first vec_id of the delta batch (ids below are assumed "
             "already indexed)",
    )
    aap.add_argument(
        "--remeasure-ladder",
        action="store_true",
        help="re-measure the manifest's recall ladder on the grown index "
             "after the append (at the manifest's recorded knobs), so "
             "--target-recall serving stays unblocked past the staleness "
             "budget without a separate ann_knob_sweep run",
    )

    asr = sub.add_parser(
        "ann-search",
        help="serve top-k neighbors for query vector ids from a "
             "persisted ann-build-index (probe -> ADC -> exact re-rank; "
             "never re-encodes the corpus)",
    )
    asr.add_argument("sf_dir")
    asr.add_argument("index_dir")
    asr.add_argument("query_ids", nargs="+", type=int)
    asr.add_argument("--k", type=int, default=5)
    asr.add_argument("--nprobe", type=int, default=4)
    asr.add_argument("--rerank", type=int, default=8)
    asr.add_argument(
        "--target-recall",
        type=float,
        default=None,
        help="resolve nprobe from the index manifest's MEASURED recall "
             "ladder instead of --nprobe (write the ladder with "
             "tools/ann_knob_sweep.py --write-manifest)",
    )

    hyb = sub.add_parser(
        "hybrid-search",
        help="the RAG serving shape from persisted indexes: BM25 top-k "
             "over a text index + dense top-k over an ann index for "
             "one query id, fused by reciprocal-rank fusion (exact "
             "integer grid) — fusion touches only the two output "
             "lists, both index-bounded",
    )
    hyb.add_argument("sf_dir")
    hyb.add_argument("text_index_dir")
    hyb.add_argument("ann_index_dir")
    hyb.add_argument("query_id", type=int)
    hyb.add_argument("terms", nargs="+")
    hyb.add_argument("--k", type=int, default=5)
    hyb.add_argument(
        "--component-k", type=int, default=10,
        help="depth of each component ranking before fusion",
    )
    hyb.add_argument("--nprobe", type=int, default=4)
    hyb.add_argument("--rerank", type=int, default=8)
    hyb.add_argument(
        "--max-df-frac", type=float, default=None,
        help="hot-term guard for the BM25 component (see text-search)",
    )
    hyb.add_argument(
        "--target-recall", type=float, default=None,
        help="resolve the dense component's nprobe from the ann index "
             "manifest's MEASURED recall ladder instead of --nprobe "
             "(see ann-search; pins the dense depth/rerank to the "
             "measured knobs)",
    )

    adl = sub.add_parser(
        "ann-delete",
        help="tombstone vectors in a persisted ann index (takedown "
             "without rebuild): search anti-joins them out exactly "
             "(delete == rebuild-on-remaining); the next ann-compact "
             "folds them out physically",
    )
    adl.add_argument("index_dir")
    adl.add_argument(
        "vec_ids", nargs="*", type=int, help="vector ids to delete"
    )
    adl.add_argument(
        "--ids-parquet", default=None,
        help="parquet whose first column holds the vec ids to delete "
             "(for batch takedowns)",
    )

    acp = sub.add_parser(
        "ann-compact",
        help="fold a tombstoned ann index into a fresh out_dir: zones "
             "anti-joined (never re-encoded), frozen artifacts copied "
             "verbatim, no tombstones zone left — serving needs no "
             "per-query adjustment afterwards",
    )
    acp.add_argument("index_dir")
    acp.add_argument("out_dir")

    tib = sub.add_parser(
        "text-index-build",
        help="build the persisted BM25 inverted index over a documents "
             "parquet (doc_id, text): tok-bucketed postings with "
             "denormalized doc lengths + dfreq/stats zones at "
             "<index_dir>/base",
    )
    tib.add_argument("docs_parquet")
    tib.add_argument("index_dir")

    tia = sub.add_parser(
        "text-index-append",
        help="index a NEW document batch into its own delta zone set "
             "(<index_dir>/delta=N) — never re-tokenizes the existing "
             "corpus; search serves base+deltas merged (associative "
             "zones, append == rebuild)",
    )
    tia.add_argument("docs_parquet")
    tia.add_argument("index_dir")

    tsr = sub.add_parser(
        "text-search",
        help="BM25 top-k over a persisted text index (base + any "
             "deltas): partition-pruned postings read, never a corpus "
             "scan",
    )
    tsr.add_argument("index_dir")
    tsr.add_argument("terms", nargs="+")
    tsr.add_argument("--k", type=int, default=10)
    tsr.add_argument(
        "--phrase",
        action="store_true",
        help="treat the terms as one exact adjacent-token phrase "
             "(positional posting intersection) instead of a BM25 "
             "bag-of-terms query — same index, no corpus re-read",
    )
    tsr.add_argument(
        "--max-df-frac", type=float, default=None,
        help="hot-term guard: drop query terms whose df exceeds this "
             "fraction of the corpus (a stopword's posting list is "
             "corpus-sized — the one shape where per-query cost stops "
             "being flat); drops are logged with the firing count",
    )

    tic = sub.add_parser(
        "text-index-compact",
        help="fold base + delta zone sets into one root at out_dir "
             "(zone-level re-sums, no re-tokenize) — bounds per-query "
             "root fan-in after many appends; folds any tombstones "
             "out physically",
    )
    tic.add_argument("index_dir")
    tic.add_argument("out_dir")

    tid = sub.add_parser(
        "text-index-delete",
        help="tombstone documents in a text index (takedown/"
             "retraction without rebuild): search subtracts their "
             "contributions exactly (delete == rebuild-on-remaining); "
             "the next compact folds them out physically",
    )
    tid.add_argument("index_dir")
    tid.add_argument(
        "doc_ids", nargs="*", type=int,
        help="document ids to delete",
    )
    tid.add_argument(
        "--ids-parquet", default=None,
        help="parquet whose first column holds the doc ids to delete "
             "(for batch takedowns)",
    )

    sib = sub.add_parser(
        "substring-index-build",
        help="build the trigram substring index over a documents "
             "parquet (doc_id, text): crc32-bucketed trigram postings "
             "at <index_dir>/base — substring-search then answers "
             "LIKE '%%needle%%' without a corpus scan",
    )
    sib.add_argument("docs_parquet")
    sib.add_argument("index_dir")

    sia = sub.add_parser(
        "substring-index-append",
        help="trigram-index a NEW document batch into its own delta "
             "zone (<index_dir>/delta=N) — postings are sets over "
             "disjoint docs, so serving base+deltas == a full rebuild",
    )
    sia.add_argument("docs_parquet")
    sia.add_argument("index_dir")

    ssr = sub.add_parser(
        "substring-search",
        help="case-insensitive substring containment over an indexed "
             "corpus: candidates from the trigram postings (partition-"
             "pruned), verified over candidates only — never a corpus "
             "text scan; needles under 3 chars are refused",
    )
    ssr.add_argument("index_dir")
    ssr.add_argument("docs_parquet",
                     help="the indexed corpus (candidates verify "
                          "against its text by keyed lookup)")
    ssr.add_argument("needle")
    ssr.add_argument("--limit", type=int, default=20,
                     help="max doc ids to print")

    sid = sub.add_parser(
        "substring-index-delete",
        help="tombstone documents in a trigram index (takedown without "
             "rebuild): search anti-joins them from the candidate set; "
             "rebuild the index (or compact) to fold them physically",
    )
    sid.add_argument("index_dir")
    sid.add_argument(
        "doc_ids", nargs="*", type=int, help="document ids to delete"
    )
    sid.add_argument(
        "--ids-parquet", default=None,
        help="parquet whose first column holds the doc ids to delete",
    )

    azb = sub.add_parser(
        "agg-zone-build",
        help="materialize a partial-aggregate zone over a parquet "
             "input at <agg_dir>/base: per-group count / exact sums / "
             "min / max / KMV distinct sketches — serve merges zones "
             "instead of recomputing (incremental rollups)",
    )
    azb.add_argument("input_parquet")
    azb.add_argument("agg_dir")
    azb.add_argument(
        "--keys", required=True,
        help="comma-separated group-key columns",
    )
    azb.add_argument("--sums", default="", help="comma-separated sum columns "
                     "(integer/decimal only — convert money doubles to the "
                     "cents/micros grid first)")
    azb.add_argument("--mins", default="", help="comma-separated min columns")
    azb.add_argument("--maxs", default="", help="comma-separated max columns")
    azb.add_argument(
        "--kmvs", default="",
        help="comma-separated distinct-sketch columns (deterministic "
             "K-Minimum-Values; exact below k distinct)",
    )
    azb.add_argument("--k", type=int, default=None,
                     help="KMV sketch size (default 64)")

    aza = sub.add_parser(
        "agg-zone-append",
        help="aggregate a NEW row batch into its own delta zone "
             "(<agg_dir>/delta=N) under the BASE zone's spec — never "
             "re-reads prior data; serve merges base+deltas "
             "(associative partials, append == rebuild)",
    )
    aza.add_argument("input_parquet")
    aza.add_argument("agg_dir")

    azs = sub.add_parser(
        "agg-zone-serve",
        help="final aggregates over all zone roots (base + deltas + "
             "streamed epochs): reads |groups|x|zones| partial rows, "
             "never the base table",
    )
    azs.add_argument("agg_dir")
    azs.add_argument("--out", default=None,
                     help="write results to this parquet dir instead of "
                          "printing")
    azs.add_argument("--limit", type=int, default=50,
                     help="max rows to print (ignored with --out)")

    azc = sub.add_parser(
        "agg-zone-compact",
        help="fold base + delta + epoch zones into ONE root at out_dir "
             "(partial-level merge, no base-table re-read) — bounds "
             "serve-time fan-in after many appends",
    )
    azc.add_argument("agg_dir")
    azc.add_argument("out_dir")

    tst = sub.add_parser(
        "table-stats",
        help="collect a per-file min/max/null/row-count manifest for a "
             "parquet table (footer reads only, distributed) into "
             "<table>/_stats_manifest — the data-skipping catalog for "
             "table-scan; re-run after appends (stale manifests refuse)",
    )
    tst.add_argument("table_dir")
    tst.add_argument("columns", nargs="*",
                     help="columns to track min/max stats for")
    tst.add_argument(
        "--blooms", default="",
        help="comma-separated columns to build per-file bloom filters "
             "for (equality skipping on hash-clustered layouts; costs "
             "one column-pruned data scan, unlike the footer-only "
             "min/max stats)",
    )

    tsc = sub.add_parser(
        "table-scan",
        help="range-scan a parquet table through its stats manifest: "
             "files whose [min,max] cannot match are never scheduled "
             "(partition pruning without partition directories)",
    )
    tsc.add_argument("table_dir")
    tsc.add_argument("column")
    tsc.add_argument("--lower", default=None,
                     help="inclusive lower bound (typed from the column)")
    tsc.add_argument("--upper", default=None,
                     help="inclusive upper bound (typed from the column)")
    tsc.add_argument(
        "--equals", default=None,
        help="point lookup: keep only files whose stats/bloom admit "
             "column == value (mutually exclusive with --lower/--upper)",
    )
    tsc.add_argument("--out", default=None,
                     help="write matching rows to this parquet dir instead "
                          "of printing the count")

    mh = sub.add_parser(
        "media-hash",
        help="per-asset near-dup keys over an assets parquet "
             "(multimodal.ASSET_SCHEMA) — one map pass.  images: BIGINT "
             "phash64 column.  audio: array<double> log-mel fingerprint "
             "column.  decode failures quarantine to NULL per row",
    )
    mh.add_argument("assets_parquet")
    mh.add_argument("out_dir")
    mh.add_argument(
        "--media", choices=["image", "audio", "video", "auto"],
        default="image",
        help="which asset rows to key (run once per modality).  'auto' "
             "sniffs each payload's MAGIC BYTES and keys all three "
             "modalities in ONE fused Arrow pass (stored labels "
             "ignored; unrecognized payloads quarantine as 'unknown')",
    )
    mh.add_argument(
        "--kind", choices=["ahash", "dhash", "phash"], default=None,
        help="image/video mode hash kind (default phash)",
    )
    mh.add_argument(
        "--n-mels", type=int, default=None,
        help="audio mode: mel bands per fingerprint (2x this many "
             "dimensions), default 16",
    )
    mh.add_argument(
        "--n-frames", type=int, default=None,
        help="video mode: evenly sampled frames per video (default 5)",
    )

    md = sub.add_parser(
        "media-dedup",
        help="media near-dup clusters over an assets parquet.  images: "
             "hash map pass → pigeonhole candidate pairs (never "
             "all-pairs) → connected components.  audio: log-mel "
             "fingerprint map pass → LSH-bucketed cosine pairs → the "
             "same components.  video: frame-hash map pass → pigeonhole "
             "frame pairs → video-pair threshold → the same components. "
             "writes (asset_id, cluster_id)",
    )
    md.add_argument("assets_parquet")
    md.add_argument("out_dir")
    md.add_argument(
        "--media", choices=["image", "audio", "video", "auto"],
        default="image",
        help="which asset rows to cluster (the other media types are "
             "ignored — run the command once per modality).  'auto' "
             "sniffs each payload's MAGIC BYTES, routes it to the "
             "right lane, and runs all three in one invocation "
             "(mixed crawl directories; labels are ignored)",
    )
    # per-modality knobs default to None so a knob set for the WRONG
    # modality can be detected and warned about instead of silently
    # ignored (resolved to the real defaults in the handler)
    md.add_argument(
        "--kind", choices=["ahash", "dhash", "phash"], default=None,
        help="image/video mode hash kind (default phash)",
    )
    md.add_argument(
        "--max-hamming", type=int, default=None,
        help="image/video mode: exact pigeonhole radius, default 3 "
             "(chunks = max-hamming + 1; larger radii shrink chunk width "
             "and grow buckets — see operators/imagehash.phash_pairs)",
    )
    md.add_argument(
        "--n-frames", type=int, default=None,
        help="video mode: evenly sampled frames per video (default 5)",
    )
    md.add_argument(
        "--min-matches", type=int, default=None,
        help="video mode: frame-hash matches required for a video pair "
             "(default 2)",
    )
    md.add_argument(
        "--threshold", type=float, default=None,
        help="audio mode: fingerprint cosine threshold for a near-dup "
             "pair, default 0.95 "
             "(operators/multimodal.audio_neardup_clusters)",
    )
    md.add_argument(
        "--n-mels", type=int, default=None,
        help="audio mode: mel bands per fingerprint (2x this many "
             "dimensions), default 16",
    )
    md.add_argument(
        "--n-planes", type=int, default=None,
        help="audio mode: hyperplane LSH planes (2^n buckets — raise "
             "for large corpora), default 4",
    )

    dfz = sub.add_parser(
        "drift-freeze",
        help="persist the corpus reference token distribution (top-V "
             "tokens + universe total) the drift monitor scores against",
    )
    dfz.add_argument("sf_dir")
    dfz.add_argument("ref_dir")
    dfz.add_argument("--top-v", type=int, default=200)

    dsc = sub.add_parser(
        "drift-score",
        help="goodness-of-fit chi-square of a batch's token distribution "
             "vs a frozen drift-freeze reference (one row: n_tokens, "
             "chi2_micro) — the batch twin of the streaming monitor",
    )
    dsc.add_argument("sf_dir")
    dsc.add_argument("ref_dir")

    ce = sub.add_parser(
        "classifier-eval",
        help="k-fold cross-validation of the quality classifier on a "
             "corpus-build profile zone: per-fold held-out AUC + "
             "log-loss (vs the zero-model baseline) — the measured "
             "quality number to ship beside --classifier-model",
    )
    ce.add_argument(
        "profile_dir",
        help="a corpus-build out_dir/profile zone (quality_stats + "
             "lang_id columns)",
    )
    ce.add_argument("--k", type=int, default=5)
    ce.add_argument(
        "--label-col",
        default=None,
        help="existing 0/1 label column in the profile zone (real "
             "deployments: curated labels joined into the zone)",
    )
    ce.add_argument(
        "--label-lang",
        default="en",
        help="without --label-col, label docs 1 when the profile zone's "
             "ground-truth `lang` column equals this (the source-"
             "affinity proxy labeling; pass --label-col for real labels)",
    )
    ce.add_argument("--n-iters", type=int, default=40)
    ce.add_argument("--lr", type=float, default=1.0)

    q = sub.add_parser("query", help="run an analytics query on the warehouse")
    q.add_argument("warehouse")
    q.add_argument(
        "name", choices=["q1", "q2", "q3", "q4", "q5", "q6", "q7"]
    )
    q.add_argument("--anio", type=int, default=2024)
    q.add_argument("--mes-corte", type=int, default=12)
    q.add_argument("--sector", default="")
    q.add_argument("--anio-fin", type=int, default=None)
    q.add_argument("--top", type=int, default=None)

    args = parser.parse_args(argv)

    if args.cmd == "sniff":
        from .sources.csv_source import sniff_csv

        # pure-driver metadata probe: no Spark session needed
        for line in sniff_csv(args.raw_csv):
            print(line)
        return

    spark = get_spark("gasto-engine-cli")

    if args.cmd == "transform":
        from pathlib import Path

        from .sources.csv_source import discover_year_files

        raw = Path(args.raw_csv)
        files = (
            discover_year_files(raw, args.years or None)
            if raw.is_dir()
            else [raw]
        )
        if not files:
            raise SystemExit(f"no matching yearly CSVs under {raw}")
        mef_pipeline.transform(
            spark,
            [str(f) for f in files],
            args.out_dir,
            overwrite=args.overwrite,
        )
        print(f"normalized {len(files)} file(s) → {args.out_dir}")
    elif args.cmd == "inspect":
        from .sources.csv_source import read_monthly_csv

        read_monthly_csv(spark, args.raw_csv).show(args.rows, truncate=40)
    elif args.cmd == "load":
        normalized = spark.read.parquet(args.normalized_dir)
        if args.years:
            # ANO_EJE is the normalized zone's partition column — this
            # filter prunes to the requested years' files
            from pyspark.sql import functions as F

            normalized = normalized.filter(F.col("ANO_EJE").isin(args.years))
        if args.validate:
            from .operators import expectations as X

            row = X.assert_ok(normalized, X.standard_monthly_checks())
            print(f"validated {row.n_rows} rows: all checks pass")
        fact = mef_pipeline.load_frame(spark, normalized, args.warehouse)
        print(f"fact rows: {fact.count()} → {args.warehouse}")
    elif args.cmd == "corpus-build":
        from .plans.corpus_pipeline import build_corpus

        report = build_corpus(
            spark, args.sf_dir, args.out_dir, lang=args.lang,
            val_fraction=args.val_fraction,
            test_fraction=args.test_fraction,
            classifier_model=args.classifier_model,
            classifier_threshold=args.classifier_threshold,
            dsir_target_sources=(
                tuple(args.dsir_target_sources)
                if args.dsir_target_sources
                else None
            ),
            dsir_keep_frac=args.dsir_keep_frac,
            dsir_sample_permille=args.dsir_sample_permille,
        )
        for k, v in report.items():
            print(f"{k}: {v}")
    elif args.cmd == "ann-build-index":
        from .operators import model_store, similarity
        from .sources.tables import load_table

        emb = load_table(spark, args.sf_dir, "embeddings")
        cents = similarity.ivf_centroids(
            emb, "vec_id", "embedding", args.n_centroids
        )
        pairs = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in cents
        ]
        cb = similarity.sampled_codebook(
            emb, "vec_id", "embedding", args.m, args.n_codes
        )
        base = args.index_dir
        model_store.save_model(
            spark, f"{base}/centroids", "ivf_centroids",
            [[c, v] for c, v in pairs],
        )
        model_store.save_pq_codebook(spark, f"{base}/codebook", cb)
        # self-describing index: serve-side geometry comes from the
        # manifest, never from CLI flags that could drift from the build
        model_store.save_model(
            spark, f"{base}/manifest", "ann_index_manifest",
            {"m": args.m, "n_codes": args.n_codes,
             "n_centroids": args.n_centroids},
        )
        assigned, codes = similarity.ivf_pq_build_index(
            emb, m=args.m, n_codes=args.n_codes,
            codebook=cb, centroids=pairs,
        )
        assigned.write.mode("overwrite").parquet(f"{base}/index_assigned")
        codes.write.mode("overwrite").parquet(f"{base}/index_codes")
        n = spark.read.parquet(f"{base}/index_assigned").count()
        print(f"indexed {n} vectors → {base}")
    elif args.cmd == "ann-append-index":
        from pyspark.sql import functions as F

        from .operators import model_store, similarity
        from .sources.tables import load_table

        emb = load_table(spark, args.sf_dir, "embeddings")
        delta = emb.filter(F.col("vec_id") >= args.from_id)
        base = args.index_dir
        clash = similarity.ann_reingest_conflicts(spark, base, delta)
        if clash:
            # a tombstone anti-joins its id out of the whole assigned
            # zone, new rows included — the re-ingested vectors would
            # be permanently invisible (the text lane's append guard)
            raise SystemExit(
                f"{'100+' if len(clash) == 100 else len(clash)} "
                "delta vec id(s) are tombstoned in this "
                f"index (e.g. {clash[:5]}); appending them would leave "
                "those vectors invisible. Run ann-compact first (it "
                "folds tombstones out) or re-ingest under fresh ids."
            )
        pairs_payload, _ = model_store.load_model(
            spark, f"{base}/centroids", "ivf_centroids"
        )
        pairs = [
            (int(c), [float(x) for x in v]) for c, v in pairs_payload
        ]
        cb = model_store.load_pq_codebook(spark, f"{base}/codebook")
        assigned, codes = similarity.ivf_pq_index_append(delta, cb, pairs)
        assigned.write.mode("append").parquet(f"{base}/index_assigned")
        codes.write.mode("append").parquet(f"{base}/index_codes")
        n = delta.count()
        total = spark.read.parquet(f"{base}/index_assigned").count()
        print(f"appended {n} vectors → {base} (index now {total})")
        # appends never re-measure the manifest's recall ladder — flag
        # the moment the index outgrows the measurement so the next
        # --target-recall serve isn't the first place it surfaces
        try:
            manifest, _ = model_store.load_model(spark, f"{base}/manifest")
        except Exception:
            manifest = {}
        anchor = manifest.get("ladder_index_n")
        stale = anchor and total > anchor * (
            1.0 + similarity.LADDER_MAX_GROWTH_FRAC
        )
        if args.remeasure_ladder:
            prev = manifest.get("recall_ladder")
            # no existing ladder (e.g. a bare ann-build-index manifest):
            # BOOTSTRAP at the default rungs rather than silently
            # no-oping with --target-recall still blocked
            nprobes = (
                tuple(int(p["nprobe"]) for p in prev)
                if prev
                else (2, 4, 8, 16)
            )
            manifest = similarity.remeasure_manifest_ladder(
                spark, emb, emb.filter(F.col("vec_id") < 10), base,
                nprobes=nprobes,
            )
            print(
                f"{'re-measured' if prev else 'bootstrapped'} the recall "
                f"ladder on {total} vectors (nprobes {list(nprobes)}) — "
                "--target-recall serving stays unblocked"
            )
        elif stale:
            print(
                f"NOTE: the manifest's recall ladder was measured at "
                f"{anchor} vectors; the index now holds {total} — "
                "--target-recall serving will refuse this stale ladder. "
                f"Re-run with --remeasure-ladder, or: python "
                f"tools/ann_knob_sweep.py <sf_dir> --write-manifest {base}"
            )
    elif args.cmd == "ann-search":
        from pyspark.sql import functions as F

        from .operators import model_store, similarity
        from .sources.tables import load_table

        emb = load_table(spark, args.sf_dir, "embeddings")
        base = args.index_dir
        manifest, _ = model_store.load_model(
            spark, f"{base}/manifest", "ann_index_manifest"
        )
        pairs_payload, _ = model_store.load_model(
            spark, f"{base}/centroids", "ivf_centroids"
        )
        pairs = [
            (int(c), [float(x) for x in v]) for c, v in pairs_payload
        ]
        cb = model_store.load_pq_codebook(spark, f"{base}/codebook")
        nprobe, k, rerank = _resolve_ann_knobs(
            spark, base, manifest, args.k, args.rerank, args.nprobe,
            args.target_recall,
        )
        tomb = similarity.ann_tombstone_ids(spark, base)
        if tomb is not None:
            print(
                "index has pending tombstones — serving subtracts them "
                "exactly (run ann-compact to fold them out physically)"
            )
        result = similarity.ivf_pq_search(
            emb,
            emb.filter(F.col("vec_id").isin(*args.query_ids)),
            k=k,
            nprobe=nprobe,
            m=manifest["m"],
            n_codes=manifest["n_codes"],
            rerank=rerank,
            codebook=cb,
            centroids=pairs,
            index=(
                spark.read.parquet(f"{base}/index_assigned"),
                spark.read.parquet(f"{base}/index_codes"),
            ),
            tombstones=tomb,
        )
        result.orderBy("query_id", "rk").show(
            k * len(args.query_ids), truncate=False
        )
    elif args.cmd == "hybrid-search":
        from pyspark.sql import functions as F

        from .operators import model_store, similarity
        from .operators.retrieval import bm25_serve
        from .sources.tables import load_table

        lex = bm25_serve(
            spark,
            _text_index_roots(args.text_index_dir),
            args.terms,
            k=args.component_k,
            max_df_frac=args.max_df_frac,
        ).select(
            F.lit(args.query_id).cast("long").alias("query_id"),
            "doc_id",
            "rk",
        )
        base = args.ann_index_dir
        manifest, _ = model_store.load_model(spark, f"{base}/manifest")
        pairs_payload, _ = model_store.load_model(
            spark, f"{base}/centroids", "ivf_centroids"
        )
        pairs = [
            (int(c), [float(x) for x in v]) for c, v in pairs_payload
        ]
        cb = model_store.load_pq_codebook(spark, f"{base}/codebook")
        emb = load_table(spark, args.sf_dir, "embeddings")
        nprobe, dense_k, rerank = _resolve_ann_knobs(
            spark, base, manifest, args.component_k, args.rerank,
            args.nprobe, args.target_recall,
        )
        dense = similarity.ivf_pq_search(
            emb,
            emb.filter(F.col("vec_id") == args.query_id),
            k=dense_k,
            nprobe=nprobe,
            m=manifest["m"],
            n_codes=manifest["n_codes"],
            rerank=rerank,
            codebook=cb,
            centroids=pairs,
            index=(
                spark.read.parquet(f"{base}/index_assigned"),
                spark.read.parquet(f"{base}/index_codes"),
            ),
            tombstones=similarity.ann_tombstone_ids(spark, base),
        ).select(
            "query_id", F.col("neighbor_id").alias("doc_id"), "rk"
        )
        fused = similarity.rrf_fuse(
            [lex, dense], k_const=60, topk=args.k, id_col="doc_id"
        )
        for r in fused.orderBy("rk").collect():
            print(
                f"{r.rk:3d}  doc {r.doc_id}  rrf {r.rrf_score}  "
                f"lists {r.n_lists}"
            )
    elif args.cmd == "ann-delete":
        from .operators import similarity

        if args.ids_parquet is not None:
            ids = spark.read.parquet(args.ids_parquet)
        elif args.vec_ids:
            ids = spark.createDataFrame(
                [(int(i),) for i in args.vec_ids], "neighbor_id LONG"
            )
        else:
            raise SystemExit("ann-delete: pass vec ids or --ids-parquet")
        n = similarity.delete_from_ann_index(spark, args.index_dir, ids)
        print(
            f"tombstoned {n} vectors (search subtracts them now; the "
            "next ann-compact folds them out physically)"
        )
    elif args.cmd == "ann-compact":
        from .operators import model_store, similarity

        out = similarity.compact_ann_index(
            spark, args.index_dir, args.out_dir
        )
        n = spark.read.parquet(f"{out}/index_assigned").count()
        print(f"compacted index → {out} ({n} vectors, no tombstones)")
        # the manifest (ladder and its ladder_index_n anchor) is copied
        # verbatim — a mass takedown leaves its measured recalls
        # describing a larger corpus.  Shrink is the conservative
        # direction (resolve_nprobe only warns), but say so here where
        # the fold happened rather than at the first --target-recall
        # serve (the ann-append-index stale-NOTE discipline).
        try:
            manifest, _ = model_store.load_model(spark, f"{out}/manifest")
        except Exception:
            manifest = {}
        anchor = manifest.get("ladder_index_n")
        if anchor and n < anchor * (
            1.0 - similarity.LADDER_MAX_GROWTH_FRAC
        ):
            print(
                f"NOTE: the manifest's recall ladder was measured at "
                f"{anchor} vectors; the compacted index holds {n} — "
                "the measured recalls are now a conservative estimate. "
                "Re-measure with tools/ann_knob_sweep.py "
                f"--write-manifest {out} to serve on current numbers."
            )
    elif args.cmd == "text-index-build":
        from .operators.retrieval import build_bm25_index

        if _is_bare_zone_root(args.index_dir):
            # a bare zone root (e.g. a compacted out_dir): writing
            # base/ under it would create an index text-search refuses
            # as ambiguous — the indexed documents would effectively
            # vanish from results (r13 review)
            raise SystemExit(
                f"{args.index_dir} is a bare zone root (postings/ "
                "present — e.g. a compacted out_dir); building base/ "
                "under it would make the index ambiguous. Build into "
                "a fresh directory."
            )
        stale = [f"delta={n}" for n in _text_index_deltas(args.index_dir)]
        stale += [f"epoch={n}" for n in _text_index_epochs(args.index_dir)]
        if stale:
            # rebuilding base while deltas/epochs survive would
            # double-count every one of their documents at search time
            # (r13 review; epochs added r15 with streamed-index CLI
            # support)
            raise SystemExit(
                f"{args.index_dir} has existing zone roots ({stale}); "
                "a rebuilt base plus stale roots double-counts their "
                "documents. Remove them (the rebuild covers them) or "
                "compact to a fresh directory instead."
            )
        docs = spark.read.parquet(args.docs_parquet)
        root = build_bm25_index(spark, docs, root=f"{args.index_dir}/base")
        n = spark.read.parquet(f"{root}/doclen").count()
        print(f"indexed {n} documents → {root}")
    elif args.cmd == "text-index-append":
        from .operators.retrieval import build_bm25_index

        if _is_bare_zone_root(args.index_dir):
            # appending delta=0 under a bare zone root would create an
            # ambiguous index (text-search refuses it) — the appended
            # documents would silently vanish from results otherwise
            raise SystemExit(
                f"{args.index_dir} is a bare zone root (postings/ "
                "present — e.g. a compacted out_dir); delta zones "
                "under it would make the index ambiguous. Append to a "
                "directory with base/ (move the compacted zones to "
                f"{args.index_dir}/base first)."
            )
        nxt = max(_text_index_deltas(args.index_dir), default=-1) + 1
        docs = spark.read.parquet(args.docs_parquet)
        from .operators.retrieval import reingest_conflicts

        clash = reingest_conflicts(
            spark, _text_index_roots(args.index_dir), docs
        )
        if clash:
            # a tombstone anti-joins its doc_id out of EVERY root,
            # including this new delta — the re-ingested docs would be
            # permanently invisible while their delta stats still
            # count (r14 review)
            raise SystemExit(
                f"{'100+' if len(clash) == 100 else len(clash)} "
                "incoming doc id(s) are tombstoned in "
                f"this index (e.g. {clash[:5]}); appending them would "
                "leave those documents invisible. Run "
                "text-index-compact first (it folds tombstones out) "
                "or re-ingest under fresh ids."
            )
        root = build_bm25_index(
            spark, docs, root=f"{args.index_dir}/delta={nxt}"
        )
        n = spark.read.parquet(f"{root}/doclen").count()
        print(f"appended {n} documents → {root}")
    elif args.cmd == "text-search":
        from .operators.retrieval import bm25_serve, phrase_serve

        roots = _text_index_roots(args.index_dir)
        if args.phrase:
            if args.max_df_frac is not None:
                # dropping a term from a PHRASE breaks its adjacency
                # semantics, so the guard can't apply — warn instead
                # of silently ignoring the knob (r14 review)
                print(
                    "warning: --max-df-frac does not apply to --phrase "
                    "(a phrase term cannot be dropped) — ignored"
                )
            rows = phrase_serve(spark, roots, args.terms, k=args.k)
            for r in rows.collect():
                print(f"{r.rk:3d}  doc {r.doc_id}  occurrences {r.n_occur}")
        else:
            rows = bm25_serve(
                spark,
                roots,
                args.terms,
                k=args.k,
                max_df_frac=args.max_df_frac,
            )
            for r in rows.collect():
                print(f"{r.rk:3d}  doc {r.doc_id}  score_q {r.bm25_q}")
    elif args.cmd == "text-index-compact":
        import os

        from .operators.retrieval import compact_bm25_index

        roots = _text_index_roots(args.index_dir)
        out_real = os.path.realpath(args.out_dir)
        # index_dir itself is checked too: out_dir == index_dir would
        # write postings/ beside base/ (an ambiguous index), and any
        # nesting either way risks Spark overwriting a path it is
        # reading — realpath comparison also catches symlink aliases
        # (r13 review)
        for r in (args.index_dir, *roots):
            r_real = os.path.realpath(r)
            if (
                out_real == r_real
                or out_real.startswith(r_real + os.sep)
                or r_real.startswith(out_real + os.sep)
            ):
                raise SystemExit(
                    f"out_dir {args.out_dir} overlaps {r}; compact to "
                    "a directory outside the index being read."
                )
        out = compact_bm25_index(spark, roots, args.out_dir)
        print(f"compacted {len(roots)} roots → {out}")
    elif args.cmd == "text-index-delete":
        from .operators.retrieval import delete_from_bm25_index

        roots = _text_index_roots(args.index_dir)
        if args.ids_parquet is not None:
            ids = spark.read.parquet(args.ids_parquet)
        elif args.doc_ids:
            ids = spark.createDataFrame(
                [(int(i),) for i in args.doc_ids], "doc_id LONG"
            )
        else:
            raise SystemExit(
                "text-index-delete: pass doc ids or --ids-parquet"
            )
        n = delete_from_bm25_index(spark, roots, ids)
        print(
            f"tombstoned {n} documents (search subtracts them now; "
            "the next text-index-compact folds them out physically)"
        )
    elif args.cmd == "substring-index-build":
        import os

        from .operators.trigram import build_trigram_index

        if os.path.isdir(f"{args.index_dir}/postings"):
            raise SystemExit(
                f"{args.index_dir} is a bare zone root (postings/ "
                "present); building base/ under it would make the "
                "index ambiguous. Build into a fresh directory."
            )
        stale = [
            f"delta={n}" for n in _numbered_subdirs(args.index_dir, "delta")
        ] + [
            f"epoch={n}" for n in _numbered_subdirs(args.index_dir, "epoch")
        ]
        if stale:
            raise SystemExit(
                f"{args.index_dir} has existing zone roots ({stale}); "
                "a rebuilt base plus stale roots double-serves their "
                "documents. Remove them first."
            )
        docs = spark.read.parquet(args.docs_parquet)
        root = build_trigram_index(
            spark, docs, root=f"{args.index_dir}/base"
        )
        n = spark.read.parquet(f"{root}/stats").collect()[0]["n_docs"]
        print(f"trigram-indexed {n} documents → {root}")
    elif args.cmd == "substring-index-append":
        import os

        from .operators.trigram import build_trigram_index

        if not os.path.isdir(f"{args.index_dir}/base"):
            raise SystemExit(
                f"{args.index_dir}: no base/ zone — run "
                "substring-index-build first"
            )
        nxt = max(_numbered_subdirs(args.index_dir, "delta"), default=-1) + 1
        docs = spark.read.parquet(args.docs_parquet)
        root = build_trigram_index(
            spark, docs, root=f"{args.index_dir}/delta={nxt}"
        )
        n = spark.read.parquet(f"{root}/stats").collect()[0]["n_docs"]
        print(f"trigram-indexed {n} documents → {root}")
    elif args.cmd == "substring-search":
        import os

        from .operators.trigram import trigram_serve

        roots = []
        if os.path.isdir(f"{args.index_dir}/postings"):
            roots = [args.index_dir]
        else:
            if os.path.isdir(f"{args.index_dir}/base"):
                roots.append(f"{args.index_dir}/base")
            roots += [
                f"{args.index_dir}/delta={n}"
                for n in _numbered_subdirs(args.index_dir, "delta")
            ]
            roots += [
                f"{args.index_dir}/epoch={n}"
                for n in _numbered_subdirs(args.index_dir, "epoch")
            ]
        if not roots:
            raise SystemExit(
                f"{args.index_dir}: no trigram index here (expected "
                "base/, delta=N/, epoch=N/, or a bare zone root)"
            )
        docs = spark.read.parquet(args.docs_parquet)
        try:
            hits = trigram_serve(spark, roots, args.needle, docs)
        except ValueError as exc:
            raise SystemExit(str(exc)) from exc
        ids = [r.doc_id for r in hits.limit(args.limit + 1).collect()]
        more = "+" if len(ids) > args.limit else ""
        print(
            f"{min(len(ids), args.limit)}{more} matching document(s): "
            f"{ids[: args.limit]}"
        )
    elif args.cmd == "substring-index-delete":
        import os

        from .operators.trigram import delete_from_trigram_index

        roots = []
        if os.path.isdir(f"{args.index_dir}/postings"):
            roots = [args.index_dir]
        elif os.path.isdir(f"{args.index_dir}/base"):
            roots = [f"{args.index_dir}/base"]
        if not roots:
            raise SystemExit(
                f"{args.index_dir}: no trigram index here"
            )
        if args.ids_parquet is not None:
            ids = spark.read.parquet(args.ids_parquet)
        elif args.doc_ids:
            ids = spark.createDataFrame(
                [(int(i),) for i in args.doc_ids], "doc_id LONG"
            )
        else:
            raise SystemExit(
                "substring-index-delete: pass doc ids or --ids-parquet"
            )
        n = delete_from_trigram_index(spark, roots, ids)
        print(
            f"tombstoned {n} documents (search anti-joins them now)"
        )
    elif args.cmd == "agg-zone-build":
        import os

        from .operators.aggzone import KMV_K, build_agg_zone

        if os.path.isfile(f"{args.agg_dir}/spec.json"):
            # a bare zone root (e.g. a compacted out_dir): base/ under
            # it would make the dir ambiguous to the roots resolver
            raise SystemExit(
                f"{args.agg_dir} is a bare zone root (spec.json "
                "present — e.g. a compacted out_dir); building base/ "
                "under it would make the dir ambiguous. Build into a "
                "fresh directory."
            )
        stale = [
            f"delta={n}" for n in _numbered_subdirs(args.agg_dir, "delta")
        ] + [
            f"epoch={n}" for n in _numbered_subdirs(args.agg_dir, "epoch")
        ]
        if stale:
            # rebuilding base while deltas/epochs survive would
            # double-count every one of their rows at serve time (the
            # text-index-build rule applied to the rollup lane)
            raise SystemExit(
                f"{args.agg_dir} has existing zone roots ({stale}); a "
                "rebuilt base plus stale roots double-counts their "
                "rows. Remove them (the rebuild covers them) or "
                "compact to a fresh directory instead."
            )
        df = spark.read.parquet(args.input_parquet)
        root = build_agg_zone(
            spark,
            df,
            keys=_split_cols(args.keys),
            sums=_split_cols(args.sums),
            mins=_split_cols(args.mins),
            maxs=_split_cols(args.maxs),
            kmvs=_split_cols(args.kmvs),
            k=args.k if args.k is not None else KMV_K,
            root=f"{args.agg_dir}/base",
        )
        n = spark.read.parquet(f"{root}/partials").count()
        print(f"materialized {n} group partials → {root}")
    elif args.cmd == "agg-zone-append":
        import os

        from .operators.aggzone import build_agg_zone, zone_spec

        if os.path.isfile(f"{args.agg_dir}/spec.json"):
            raise SystemExit(
                f"{args.agg_dir} is a bare zone root (spec.json "
                "present — e.g. a compacted out_dir); delta zones "
                "under it would make the dir ambiguous. Append to a "
                "directory with base/ (move the compacted zone to "
                f"{args.agg_dir}/base first)."
            )
        base = f"{args.agg_dir}/base"
        if not os.path.isdir(base):
            raise SystemExit(
                f"{args.agg_dir}: no base/ zone — run agg-zone-build "
                "first (the append derives its spec from the base so "
                "zones can never diverge)"
            )
        spec = zone_spec(base)
        nxt = max(_numbered_subdirs(args.agg_dir, "delta"), default=-1) + 1
        df = spark.read.parquet(args.input_parquet)
        root = build_agg_zone(
            spark, df, root=f"{args.agg_dir}/delta={nxt}", **spec
        )
        n = spark.read.parquet(f"{root}/partials").count()
        print(f"appended {n} group partials → {root}")
    elif args.cmd == "agg-zone-serve":
        from .operators.aggzone import serve_agg

        roots = _agg_zone_roots(args.agg_dir)
        out = serve_agg(spark, roots)
        if args.out:
            out.write.parquet(args.out)
            print(
                f"served {len(roots)} zone root(s) → {args.out}"
            )
        else:
            cols = out.columns
            print("\t".join(cols))
            for r in out.limit(args.limit).collect():
                print("\t".join(str(r[c]) for c in cols))
    elif args.cmd == "agg-zone-compact":
        from .operators.aggzone import compact_agg_zones

        roots = _agg_zone_roots(args.agg_dir)
        # compact_agg_zones guards root overlap itself; the agg_dir
        # container is checked here (out_dir == agg_dir would write a
        # bare zone BESIDE base/ — the ambiguous layout)
        import os

        out_real = os.path.realpath(args.out_dir)
        dir_real = os.path.realpath(args.agg_dir)
        if (
            out_real == dir_real
            or out_real.startswith(dir_real + os.sep)
            or dir_real.startswith(out_real + os.sep)
        ):
            raise SystemExit(
                f"out_dir {args.out_dir} overlaps {args.agg_dir}; "
                "compact to a directory outside the zones being read."
            )
        out = compact_agg_zones(spark, roots, args.out_dir)
        print(f"compacted {len(roots)} zone root(s) → {out}")
    elif args.cmd == "table-stats":
        from .sources.manifest import build_stats_manifest

        out = build_stats_manifest(
            spark,
            args.table_dir,
            args.columns,
            blooms=_split_cols(args.blooms),
        )
        n = spark.read.parquet(out).count()
        print(f"collected stats for {n} file(s) → {out}")
    elif args.cmd == "table-scan":
        from .sources.manifest import (
            point_lookup,
            pruned_scan,
            select_files,
            select_files_eq,
        )

        def typed(bound):
            if bound is None:
                return None
            for cast in (int, float):
                try:
                    return cast(bound)
                except ValueError:
                    continue
            return bound

        if args.equals is not None and (
            args.lower is not None or args.upper is not None
        ):
            raise SystemExit(
                "table-scan: --equals is mutually exclusive with "
                "--lower/--upper"
            )
        if args.equals is not None:
            v = typed(args.equals)
            kept, total = select_files_eq(
                spark, args.table_dir, args.column, v
            )
            df = point_lookup(spark, args.table_dir, args.column, v)
        else:
            lo, hi = typed(args.lower), typed(args.upper)
            kept, total = select_files(
                spark, args.table_dir, args.column, lo, hi
            )
            df = pruned_scan(spark, args.table_dir, args.column, lo, hi)
        if args.out:
            df.write.parquet(args.out)
            print(
                f"scanned {len(kept)}/{total} file(s) → {args.out}"
            )
        else:
            print(
                f"scanned {len(kept)}/{total} file(s), "
                f"{df.count()} matching row(s)"
            )
    elif args.cmd == "media-hash":
        assets = spark.read.parquet(args.assets_parquet)

        if args.media == "auto":
            from .operators.multimodal import media_keys_auto

            # every knob applies to its own lane in auto mode
            out = media_keys_auto(
                assets,
                kind="phash" if args.kind is None else args.kind,
                n_mels=16 if args.n_mels is None else args.n_mels,
                n_frames=5 if args.n_frames is None else args.n_frames,
            )
            out.write.mode("overwrite").parquet(args.out_dir)
            done = spark.read.parquet(args.out_dir)
            per_mode = {
                r["media_type"]: r["count"]
                for r in done.groupBy("media_type").count().collect()
            }
            n = sum(per_mode.values())
            keyed = sum(
                v for m, v in per_mode.items() if m != "unknown"
            )
            print(
                f"recognized {keyed}/{n} assets (image "
                f"{per_mode.get('image', 0)}, audio "
                f"{per_mode.get('audio', 0)}, video "
                f"{per_mode.get('video', 0)}; "
                f"{per_mode.get('unknown', 0)} unrecognized) → "
                f"{args.out_dir}"
            )
            return
        if args.media == "audio":
            from .operators.multimodal import audio_fingerprints

            _warn_cross_modality(args.media, ("--kind", args.kind), ("--n-frames", args.n_frames))
            out = audio_fingerprints(
                assets, n_mels=16 if args.n_mels is None else args.n_mels
            ).select("asset_id", "fingerprint")
            key_col, label = "fingerprint", "mel-fingerprint"
        elif args.media == "video":
            from .operators.videohash import video_hashes

            _warn_cross_modality(args.media, ("--n-mels", args.n_mels))
            kind = "phash" if args.kind is None else args.kind
            out = video_hashes(
                assets, kind,
                n_frames=5 if args.n_frames is None else args.n_frames,
            ).select("asset_id", "frame_hashes")
            key_col, label = "frame_hashes", f"frame-{kind}"
        else:
            from .operators.multimodal import image_hashes

            _warn_cross_modality(args.media, ("--n-mels", args.n_mels),
                         ("--n-frames", args.n_frames))
            kind = "phash" if args.kind is None else args.kind
            out = image_hashes(assets, kind).select("asset_id", "phash64")
            key_col, label = "phash64", kind
        out.write.mode("overwrite").parquet(args.out_dir)
        done = spark.read.parquet(args.out_dir)
        n = done.count()
        nn = done.where(f"{key_col} IS NOT NULL").count()
        print(
            f"hashed {nn}/{n} assets ({label}) → {args.out_dir} "
            f"({n - nn} quarantined/non-{args.media})"
        )
    elif args.cmd == "media-dedup":
        assets = spark.read.parquet(args.assets_parquet)
        if args.media == "auto":
            from .operators.imagehash import image_neardup_clusters
            from .operators.multimodal import (
                audio_neardup_clusters,
                sniff_media_types,
            )
            from .operators.videohash import video_neardup_clusters

            # every knob applies to its own lane in auto mode — no
            # cross-modality warnings.  One sniff pass relabels
            # media_type from magic bytes; each lane then filters on
            # the label exactly as a single-media run would, so the
            # per-modality outputs are identical to three separate
            # invocations with correct labels (tested).  The relabeled
            # frame is checkpointed once: three lanes would otherwise
            # each rerun the Arrow sniff pass over the payload bytes.
            sniffed = pin(sniff_media_types(assets), eager=True)
            max_hamming = 3 if args.max_hamming is None else args.max_hamming
            threshold = 0.95 if args.threshold is None else args.threshold
            min_matches = 2 if args.min_matches is None else args.min_matches
            lanes = {
                "image": image_neardup_clusters(
                    sniffed,
                    kind="phash" if args.kind is None else args.kind,
                    max_hamming=max_hamming,
                    log_capped=True,
                ),
                "audio": audio_neardup_clusters(
                    sniffed,
                    n_mels=16 if args.n_mels is None else args.n_mels,
                    threshold=threshold,
                    n_planes=4 if args.n_planes is None else args.n_planes,
                    log_capped=True,
                ),
                "video": video_neardup_clusters(
                    sniffed,
                    kind="phash" if args.kind is None else args.kind,
                    n_frames=5 if args.n_frames is None else args.n_frames,
                    max_hamming=max_hamming,
                    min_matches=min_matches,
                    log_capped=True,
                ),
            }
            # asset ids are globally unique, so the min-id cluster
            # labels of disjoint modality lanes can never collide
            out = None
            for frame in lanes.values():
                out = frame if out is None else out.unionByName(frame)
            out.write.mode("overwrite").parquet(args.out_dir)
            done = spark.read.parquet(args.out_dir)
            # per-lane counts from the WRITTEN frame (one join against
            # the sniffed labels) — re-running the three lane pipelines
            # just to count them doubled the command's wall clock
            # (r13 review)
            per_mode = {
                r["media_type"]: r["count"]
                for r in done.join(
                    sniffed.select("asset_id", "media_type"), "asset_id"
                )
                .groupBy("media_type")
                .count()
                .collect()
            }
            per_mode = {
                m: per_mode.get(m, 0) for m in ("image", "audio", "video")
            }
            n = sum(per_mode.values())
            groups = done.select("cluster_id").distinct().count()
            total = sniffed.count()
            print(
                f"clustered {n} sniffed assets into {groups} groups "
                f"(image {per_mode['image']}, audio {per_mode['audio']}, "
                f"video {per_mode['video']}; "
                f"{total - n} unrecognized/quarantined) → {args.out_dir}"
            )
            return
        if args.media == "audio":
            from .operators.multimodal import audio_neardup_clusters

            _warn_cross_modality(args.media, 
                ("--kind", args.kind), ("--max-hamming", args.max_hamming),
                ("--n-frames", args.n_frames),
                ("--min-matches", args.min_matches),
            )
            threshold = 0.95 if args.threshold is None else args.threshold
            clusters = audio_neardup_clusters(
                assets,
                n_mels=16 if args.n_mels is None else args.n_mels,
                threshold=threshold,
                n_planes=4 if args.n_planes is None else args.n_planes,
                log_capped=True,
            )
            knob = f"cosine >= {threshold}"
            noun = "fingerprinted"
        elif args.media == "video":
            from .operators.videohash import video_neardup_clusters

            _warn_cross_modality(args.media, 
                ("--threshold", args.threshold), ("--n-mels", args.n_mels),
                ("--n-planes", args.n_planes),
            )
            max_hamming = 3 if args.max_hamming is None else args.max_hamming
            min_matches = 2 if args.min_matches is None else args.min_matches
            clusters = video_neardup_clusters(
                assets,
                kind="phash" if args.kind is None else args.kind,
                n_frames=5 if args.n_frames is None else args.n_frames,
                max_hamming=max_hamming,
                min_matches=min_matches,
                log_capped=True,
            )
            knob = f"radius {max_hamming}, matches >= {min_matches}"
            noun = "frame-hashed"
        else:
            from .operators.imagehash import image_neardup_clusters

            _warn_cross_modality(args.media, 
                ("--threshold", args.threshold), ("--n-mels", args.n_mels),
                ("--n-planes", args.n_planes),
                ("--n-frames", args.n_frames),
                ("--min-matches", args.min_matches),
            )
            max_hamming = 3 if args.max_hamming is None else args.max_hamming
            clusters = image_neardup_clusters(
                assets,
                kind="phash" if args.kind is None else args.kind,
                max_hamming=max_hamming,
                log_capped=True,
            )
            knob = f"radius {max_hamming}"
            noun = "hashed"
        clusters.write.mode("overwrite").parquet(args.out_dir)
        done = spark.read.parquet(args.out_dir)
        n = done.count()
        groups = done.select("cluster_id").distinct().count()
        print(
            f"clustered {n} {noun} assets into {groups} groups "
            f"({knob}) → {args.out_dir}"
        )
    elif args.cmd == "drift-freeze":
        from .operators.textstats import token_distribution
        from .sources.tables import load_table

        docs = load_table(spark, args.sf_dir, "documents")
        token_distribution(docs, top_v=args.top_v).write.mode(
            "overwrite"
        ).parquet(args.ref_dir)
        n = spark.read.parquet(args.ref_dir).count()
        print(f"froze {n}-token reference distribution → {args.ref_dir}")
    elif args.cmd == "drift-score":
        from .operators.textstats import chi2_against_reference
        from .sources.tables import load_table

        docs = load_table(spark, args.sf_dir, "documents")
        ref = spark.read.parquet(args.ref_dir)
        chi2_against_reference(docs, ref).show(truncate=False)
    elif args.cmd == "classifier-eval":
        from pyspark.sql import functions as F

        from .operators import classifier
        from .plans.corpus_pipeline import QUALITY_FEATURES

        profile = spark.read.parquet(args.profile_dir)
        label_col = args.label_col
        if label_col is None:
            label_col = "label"
            profile = profile.withColumn(
                "label", (F.col("lang") == args.label_lang).cast("int")
            )
        # each fold's trainer re-reads the frame n_iters times — cut it
        profile = pin(
            profile.select("doc_id", label_col, *QUALITY_FEATURES),
            eager=True,
        )
        folds = classifier.kfold_eval(
            profile,
            list(QUALITY_FEATURES),
            label_col=label_col,
            k=args.k,
            n_iters=args.n_iters,
            lr=args.lr,
        )
        for row in folds:
            print(
                f"fold {row['fold']}: n_train={row['n_train']} "
                f"n_eval={row['n_eval']} auc={row['auc']} "
                f"logloss={row['logloss']} "
                f"(zero-model {row['logloss_zero']})"
            )
        mean_auc = sum(r["auc"] for r in folds) / len(folds)
        mean_ll = sum(r["logloss"] for r in folds) / len(folds)
        print(
            f"mean: auc={round(mean_auc, 4)} logloss={round(mean_ll, 4)} "
            f"over k={args.k} folds"
        )
    elif args.cmd == "sql":
        mef_pipeline.register_views(spark, args.warehouse)
        spark.sql(args.statement).show(args.rows, truncate=False)
    elif args.cmd == "refresh-agg":
        mef_pipeline.materialize_agg_mensual(
            spark, args.warehouse, args.agg_path, years=args.years or None
        )
        scope = f"years {args.years}" if args.years else "full rebuild"
        print(f"aggregate refreshed ({scope}) → {args.agg_path}")
    else:
        base = mef_pipeline.register_views(spark, args.warehouse)
        runners = {
            "q1": lambda: Q.q1_ytd_by_sector(base, args.anio, args.mes_corte),
            "q2": lambda: Q.q2_top_ejecutoras(base, args.anio, args.top or 5),
            "q3": lambda: Q.q3_share_of_total(
                base, args.anio, args.mes_corte, args.sector
            ),
            "q4": lambda: Q.q4_backlog(base, args.anio, args.mes_corte),
            "q5": lambda: Q.q5_quarterly_evolution(
                base, args.anio, args.anio_fin or args.anio
            ),
            "q6": lambda: Q.q6_rollup_year_sector(base),
            "q7": lambda: Q.q7_topn_year(base, args.anio, args.top or 10),
        }
        runners[args.name]().show(50, truncate=False)


if __name__ == "__main__":
    main()
