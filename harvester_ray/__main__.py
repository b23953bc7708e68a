"""Management CLI: ``python -m harvester_ray <command> ...``.

The reference drives its lifecycle through Django management commands
(``run_harvest``, ``sync_opensearch_indices``, ``index_dataset_version`` —
harvester/core/management/commands/, harvester/search/management/): build a
dataset version, push deltas, promote, inspect. The Ray re-expression maps
those onto the library surface one-to-one; this module is the operator's
entry point, and the ONLY place (besides bench.py and the test fixture)
that owns a Ray session.

Commands::

  build     <parquet_dir_or_file> <index_root> [--attrs a,b] [--positions]
  delta     <parquet_dir_or_file> <index_root>       # incremental + guard
  search    <index_root> <query> [--k 10] [--mode and|or]
  msearch   <index_root> <query> [<query> ...] [--k 10]
  compact   <index_root> [--target 8 | --tiered]
  snapshot  <index_root> <repo_dir> [--name NAME]
  restore   <repo_dir> <name> <dest_root>
  stats     <index_root>
  reindex   <src_root> <dest_root> [--filter col=v1,v2]   # needs _source
  delete-by-query <index_root> <query> [--mode and|or]
  update-by-query <index_root> <query> --append TEXT [--mode and|or]
  rollover  <registry_dir> <alias> <new_root> --max-docs N
  prune-snapshots <repo_dir> --keep-last N
  fsck      <index_root> [--shallow]           # CheckIndex analog
  update    <index_root> <doc_id> <json_fields>  # ES _update partial merge
  cat-indices <index_root>                     # ES _cat/indices lineage

Input parquet needs (doc_id, text[, attrs...]) — or transcript shape
(conv_id, turn_idx, text), detected by column sniffing, in which case
doc ids are assigned by the stable (conv_id, turn_idx) rule.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True)


def _load_corpus(path: str):
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from harvester_ray import corpus

    probe = path
    if os.path.isdir(path):
        probe = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet")
        )[0]
    cols = set(pq.read_schema(probe).names)
    ds = rd.read_parquet(path)
    if "doc_id" in cols:
        return ds
    if {"conv_id", "turn_idx"} <= cols:
        return corpus.assign_doc_ids(ds)
    raise SystemExit("input needs doc_id or (conv_id, turn_idx) columns")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="harvester_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("input")
    b.add_argument("root")
    b.add_argument("--attrs", default="")
    b.add_argument("--positions", action="store_true")
    b.add_argument("--store-source", action="store_true",
                   help="keep raw text in the doc tables (enables partial update)")

    d = sub.add_parser("delta")
    d.add_argument("input")
    d.add_argument("root")

    s = sub.add_parser("search")
    s.add_argument("root")
    s.add_argument("query")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--mode", default="and", choices=["and", "or"])

    ms = sub.add_parser("msearch")
    ms.add_argument("root")
    ms.add_argument("queries", nargs="+")
    ms.add_argument("--k", type=int, default=10)

    sr = sub.add_parser("search-dsl")  # ES _search JSON body (query+aggs)
    sr.add_argument("root")
    sr.add_argument("body", help="JSON _search body or @path/to/body.json")

    c = sub.add_parser("compact")
    c.add_argument("root")
    c.add_argument("--target", type=int, default=8)
    c.add_argument("--tiered", action="store_true")

    sn = sub.add_parser("snapshot")
    sn.add_argument("root")
    sn.add_argument("repo")
    sn.add_argument("--name", default=None)

    rs = sub.add_parser("restore")
    rs.add_argument("repo")
    rs.add_argument("name")
    rs.add_argument("dest")

    st = sub.add_parser("stats")
    st.add_argument("root")

    ri = sub.add_parser("reindex")
    ri.add_argument("src")
    ri.add_argument("dest")
    ri.add_argument("--filter", default=None,
                    help="attr filter col=v1,v2 (values OR'd)")

    dq = sub.add_parser("delete-by-query")
    dq.add_argument("root")
    dq.add_argument("query")
    dq.add_argument("--mode", default="or", choices=["and", "or"])

    uq = sub.add_parser("update-by-query")
    uq.add_argument("root")
    uq.add_argument("query")
    uq.add_argument("--append", required=True,
                    help="text appended to every matching doc's _source")
    uq.add_argument("--mode", default="or", choices=["and", "or"])

    ro = sub.add_parser("rollover")
    ro.add_argument("registry")
    ro.add_argument("alias")
    ro.add_argument("new_root")
    ro.add_argument("--max-docs", type=int, required=True)

    ps = sub.add_parser("prune-snapshots")
    ps.add_argument("repo")
    ps.add_argument("--keep-last", type=int, required=True)

    fk = sub.add_parser("fsck")
    fk.add_argument("root")
    fk.add_argument("--shallow", action="store_true")

    up = sub.add_parser("update")  # ES _update: partial doc merge
    up.add_argument("root")
    up.add_argument("doc_id", type=int)
    up.add_argument("fields", help="JSON object of fields to merge")

    ci = sub.add_parser("cat-indices")  # ES _cat/indices: version lineage
    ci.add_argument("root")

    vq = sub.add_parser("validate-query")  # ES _validate/query: parse only
    vq.add_argument("body", help="JSON query body or @path")

    fc = sub.add_parser("field-caps")  # ES _field_caps
    fc.add_argument("root")

    args = p.parse_args(argv)

    if args.cmd == "build":
        _ray_init()
        from harvester_ray.index import build

        man = build.build_index(
            _load_corpus(args.input), args.root,
            attr_cols=[a for a in args.attrs.split(",") if a],
            store_positions=args.positions,
            store_source=args.store_source,
            input_desc=args.input,
        )
        print(json.dumps({"version": man["version"], "n_docs": man["n_docs"],
                          "segments": len(man["segments"])}))
    elif args.cmd == "delta":
        _ray_init()
        from harvester_ray.index import incremental

        man = incremental.build_incremental(
            args.root, _load_corpus(args.input), input_desc=args.input
        )
        print(json.dumps({"version": man.get("version"),
                          "n_docs": man.get("n_docs")}))
    elif args.cmd == "search":
        from harvester_ray.index import query

        out = query.IndexReader(args.root).search(
            args.query, k=args.k, mode=args.mode
        ).to_pandas()
        out["score"] = out["score"].round(4)
        print(out.to_json(orient="records"))
    elif args.cmd == "search-dsl":
        from harvester_ray.index import api, query

        raw = args.body
        if raw.startswith("@"):
            with open(raw[1:]) as f:
                raw = f.read()
        resp = api.search_request(query.IndexReader(args.root), json.loads(raw))
        print(json.dumps(resp, default=str))
    elif args.cmd == "msearch":
        from harvester_ray.index import query

        out = query.IndexReader(args.root).msearch(
            args.queries, k=args.k, mode="or"
        ).to_pandas()
        out["score"] = out["score"].round(4)
        print(out.to_json(orient="records"))
    elif args.cmd == "compact":
        _ray_init()
        from harvester_ray.index import compact

        man = (compact.compact_tiered(args.root) if args.tiered
               else compact.compact(args.root, target_segments=args.target))
        print(json.dumps({"version": man.get("version", man.get("_version")),
                          "segments": len(man["segments"])}))
    elif args.cmd == "snapshot":
        from harvester_ray.index import snapshot

        rec = snapshot.snapshot(args.root, args.repo, name=args.name)
        print(json.dumps(rec))
    elif args.cmd == "restore":
        from harvester_ray.index import snapshot

        rec = snapshot.restore(args.repo, args.name, args.dest)
        print(json.dumps({"name": rec["name"], "version": rec["version"]}))
    elif args.cmd == "stats":
        from harvester_ray.index import manifest as mf

        man = mf.read_manifest(args.root)
        print(json.dumps({
            "version": man["_version"], "n_docs": man["n_docs"],
            "avgdl": man["avgdl"], "segments": len(man["segments"]),
            "tombstones": len(man.get("tombstones", [])),
        }))
    if args.cmd == "reindex":
        _ray_init()
        from harvester_ray.index import reindex as reindex_mod

        filters = None
        if args.filter:
            col, _, vals = args.filter.partition("=")
            filters = {col: vals.split(",")}
        man = reindex_mod.reindex(args.src, args.dest, filters=filters)
        print(json.dumps({"version": man["version"], "n_docs": man["n_docs"]}))
    elif args.cmd == "delete-by-query":
        _ray_init()
        from harvester_ray.index import extras

        print(json.dumps(extras.delete_by_query(
            args.root, args.query, mode=args.mode
        )))
    elif args.cmd == "update-by-query":
        _ray_init()
        import pyarrow.compute as pc

        from harvester_ray.index import extras

        res = extras.update_by_query(
            args.root, args.query,
            lambda arr: pc.binary_join_element_wise(arr, args.append, ""),
            mode=args.mode,
        )
        print(json.dumps(res))
    elif args.cmd == "rollover":
        from harvester_ray.index import manifest as mf

        print(json.dumps(mf.rollover(
            args.registry, args.alias, args.new_root, max_docs=args.max_docs
        )))
    elif args.cmd == "prune-snapshots":
        from harvester_ray.index import snapshot

        print(json.dumps(snapshot.prune_snapshots(
            args.repo, keep_last=args.keep_last
        )))
    elif args.cmd == "fsck":
        from harvester_ray.index import fsck

        rep = fsck.fsck(args.root, deep=not args.shallow)
        print(json.dumps(rep))
        return 0 if rep["ok"] else 2
    elif args.cmd == "update":
        _ray_init()
        from harvester_ray.index import incremental

        man = incremental.update_document(
            args.root, args.doc_id, json.loads(args.fields)
        )
        print(json.dumps({"version": man.get("version"),
                          "result": "updated"}))
    elif args.cmd == "cat-indices":
        from harvester_ray.index import build

        print(build.cat_indices(args.root).to_json(orient="records"))
    elif args.cmd == "validate-query":
        from harvester_ray.index import api

        raw = args.body
        if raw.startswith("@"):
            with open(raw[1:]) as f:
                raw = f.read()
        res = api.validate_query(json.loads(raw))
        print(json.dumps(res))
        return 0 if res["valid"] else 2
    elif args.cmd == "field-caps":
        from harvester_ray.index import api, query

        print(api.field_caps(query.IndexReader(args.root)).to_json(
            orient="records"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
