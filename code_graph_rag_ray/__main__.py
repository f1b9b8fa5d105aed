"""CLI — the analog of the reference's ``cgr index`` offline mode
(``cli.py:554-631``): pure files-in → graph-files-out.

    python -m code_graph_rag_ray build --pages P.parquet --alias A.parquet \
        --out /tmp/graph [--checkpoint /tmp/ck] [--relations-json R.json]
    python -m code_graph_rag_ray update --pages CHANGED.parquet \
        --alias A.parquet --prev-mentions /tmp/ck/mentions/data --out /tmp/graph2
    python -m code_graph_rag_ray export-json --pages P.parquet \
        --alias A.parquet --out /tmp/graph_json

Owns its Ray session (guarded init) — the only module besides bench.py and
the test fixture allowed to."""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from code_graph_rag_ray.context import configure_data_context

    configure_data_context()


def _load_alias(path: str):
    import pyarrow.parquet as pq

    return pq.read_table(path)


def _load_relations(path: str | None):
    if not path:
        return None
    with open(path) as f:
        return json.load(f)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="code_graph_rag_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="clean KG build + partitioned materialize")
    b.add_argument("--pages", required=True)
    b.add_argument("--alias", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--checkpoint")
    b.add_argument("--relations-json")
    b.add_argument("--num-partitions", type=int, default=16)

    u = sub.add_parser("update", help="incremental update from changed pages")
    u.add_argument("--pages", required=True, help="parquet of CHANGED pages")
    u.add_argument("--alias", required=True)
    u.add_argument("--prev-mentions", required=True, help="prior mentions parquet dir")
    u.add_argument("--out", required=True)
    u.add_argument("--relations-json")
    u.add_argument("--num-partitions", type=int, default=16)

    e = sub.add_parser("export-json", help="build + JSON-lines graph export")
    e.add_argument("--pages", required=True)
    e.add_argument("--alias", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--relations-json")

    xb = sub.add_parser(
        "export-binary",
        help="build + length-prefixed binary record sink (cgr index offline analog)",
    )
    xb.add_argument("--pages", required=True)
    xb.add_argument("--alias", required=True)
    xb.add_argument("--out", required=True)
    xb.add_argument("--relations-json")

    ln = sub.add_parser(
        "links", help="hyperlink graph: extract hrefs + resolve against corpus urls"
    )
    ln.add_argument("--pages", required=True)
    ln.add_argument("--out", required=True)

    c = sub.add_parser(
        "clean",
        help="paragraph-dedup the corpus: keep first-occurrence windows, "
             "write (id, clean_text, n_kept) parquet",
    )
    c.add_argument("--docs", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--window", type=int, default=16)
    c.add_argument("--id-col", default="doc_id")
    c.add_argument("--text-col", default="text")

    q = sub.add_parser(
        "query",
        help="point lookups over a materialized store (partition-pruned subj reads)",
    )
    q.add_argument("--store", required=True)
    q.add_argument("--subj")
    q.add_argument("--pred")
    q.add_argument("--obj")
    q.add_argument("--num-partitions", type=int, default=16)

    args = p.parse_args(argv)
    if args.cmd == "query":
        # plain pyarrow serve path — no Ray session needed
        from code_graph_rag_ray.stages.serve import query_edges

        t = query_edges(args.store, subj=args.subj, pred=args.pred,
                        obj=args.obj, num_partitions=args.num_partitions)
        import json as _json

        for row in t.to_pylist():
            print(_json.dumps(row, sort_keys=True))
        return 0
    _init_ray()

    import ray
    import ray.data as rd

    from code_graph_rag_ray.pipelines.kg import (
        build_kg,
        export_graph_json,
        incremental_update,
        materialize_kg,
    )

    try:
        if args.cmd == "clean":
            from code_graph_rag_ray.stages.paragraphs import paragraph_dedup_apply

            docs = rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
            out = paragraph_dedup_apply(
                docs, window=args.window, id_col=args.id_col,
                text_col=args.text_col,
            )
            out.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
            return 0
        pages = rd.read_parquet(args.pages)
        if args.cmd == "links":
            import os

            from code_graph_rag_ray.stages.links import extract_links, resolve_links

            out = resolve_links(
                extract_links(pages), pages.select_columns(["url"])
            )
            out["internal"].write_parquet(os.path.join(args.out, "links_to"))
            out["external"].write_parquet(os.path.join(args.out, "ext_sites"))
            print(json.dumps({"out": args.out}))
            return 0
        alias = _load_alias(args.alias)
        relations = _load_relations(args.relations_json)

        if args.cmd == "build":
            kg = build_kg(
                pages, alias, relations=relations, checkpoint_dir=args.checkpoint
            )
            man = materialize_kg(kg, args.out, num_partitions=args.num_partitions)
            print(json.dumps({"edges": man["edges"]["rows"], "nodes": man["nodes"]["rows"]}))
        elif args.cmd == "update":
            prev = rd.read_parquet(args.prev_mentions)
            kg = incremental_update(
                pages, alias, prev_mentions=prev, relations=relations
            )
            man = materialize_kg(kg, args.out, num_partitions=args.num_partitions)
            print(json.dumps({"edges": man["edges"]["rows"], "nodes": man["nodes"]["rows"]}))
        elif args.cmd == "export-binary":
            import os

            from code_graph_rag_ray.sinks.binary import write_binary_graph

            kg = build_kg(pages, alias, relations=relations)
            ei = write_binary_graph(kg["edges"], os.path.join(args.out, "edges"))
            ni = write_binary_graph(
                kg["nodes"], os.path.join(args.out, "nodes"), label_col="label"
            )
            print(json.dumps({"edges": ei["rows"], "nodes": ni["rows"]}))
        else:  # export-json
            kg = build_kg(pages, alias, relations=relations)
            export_graph_json(kg, args.out)
            print(json.dumps({"out": args.out}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
