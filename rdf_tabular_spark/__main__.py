"""csv2rdf / csv2json command line, the analog of the reference's CLI
registration (format.rb:40-71: ``--metadata``, ``--minimal``, validation).

    python -m rdf_tabular_spark table.csv --format ntriples
    python -m rdf_tabular_spark metadata.json --mode standard -o out_dir
    python -m rdf_tabular_spark table.csv --json --mode minimal
    python -m rdf_tabular_spark metadata.json --validate

Input may be a CSV/TSV file, a CSVW metadata JSON document, or an HTML
document with an ``application/csvm+json`` script block. Output goes to
stdout unless ``-o`` names a directory (distributed N-Triples text write).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="rdf_tabular_spark",
        description="CSVW tabular data -> RDF triples / JSON on Spark")
    ap.add_argument("input", help="CSV/TSV file, metadata .json, or .html")
    ap.add_argument("--metadata", help="explicit metadata JSON for a CSV input")
    ap.add_argument("--base", help="base IRI (default: file:// of the input)")
    ap.add_argument("--mode", choices=["minimal", "standard"],
                    default="minimal")
    ap.add_argument("--json", action="store_true",
                    help="csv2json output instead of RDF")
    ap.add_argument("--format", choices=["ntriples", "turtle"],
                default="ntriples")
    ap.add_argument("--canonical", action="store_true",
                help="canonicalize blank-node labels (WL hash refinement, "
                     "kg/canon.py) and emit sorted canonical N-Triples — "
                     "byte-identical output for isomorphic graphs")
    ap.add_argument("-o", "--output",
                    help="output directory (distributed text write); "
                         "default: stdout")
    ap.add_argument("--validate", action="store_true",
                    help="run validation instead of conversion; exit 1 "
                         "with a problem report when invalid")
    ap.add_argument("--sparql", metavar="QUERY",
                    help="run a SPARQL query string over the produced "
                         "triples and print the result as TSV (SELECT/"
                         "ASK) or N-Triples (CONSTRUCT/DESCRIBE)")
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(args.master)
        .appName("rdf-tabular-spark-cli")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        return _run(spark, args)
    finally:
        spark.stop()


def _infer_metadata(args) -> tuple[object, str]:
    """-> (metadata argument for the reader, base IRI)."""
    path = os.path.abspath(args.input)
    base = args.base or ("file://" + path)
    low = path.lower()
    if low.endswith((".json", ".html", ".htm")):
        return path, base
    if args.metadata:
        with open(args.metadata, encoding="utf-8") as f:
            doc = json.load(f)
        doc.setdefault("url", base)
        return doc, args.base or ("file://" + os.path.abspath(args.metadata))
    doc = {"url": base}
    if low.endswith((".tsv", ".tab")):
        doc["dialect"] = {"delimiter": "\t"}
    return doc, base


def _run(spark, args) -> int:
    from .reader import to_json, to_triples, validate

    meta, base = _infer_metadata(args)
    url_map = None
    if not str(args.input).lower().endswith((".json", ".html", ".htm")):
        url_map = {base: os.path.abspath(args.input)}

    if args.validate:
        problems = validate(spark, meta, base=base, url_map=url_map)
        rows = problems.collect()
        for r in rows:
            print(f"{r['kind']}\t{r['table']}\t{r['column'] or ''}\t"
                  f"{r['detail'] or ''}", file=sys.stderr)
        print(f"{len(rows)} problem(s)", file=sys.stderr)
        return 1 if rows else 0

    if args.json:
        value = to_json(spark, meta, base=base, url_map=url_map,
                        mode=args.mode)
        out = json.dumps(value, indent=2, ensure_ascii=False)
        if args.output:
            with open(args.output, "w", encoding="utf-8") as f:
                f.write(out + "\n")
        else:
            print(out)
        return 0

    result = to_triples(spark, meta, base=base, url_map=url_map,
                        mode=args.mode)
    if args.sparql:
        from .kg.sparql import sparql

        out = sparql(result.triples, args.sparql)
        if set(out.columns) == {"subj", "pred", "obj", "obj_is_iri",
                                "obj_datatype", "obj_lang"}:
            from .operators.ntriples import to_ntriples_lines

            for r in to_ntriples_lines(out).collect():
                print(r[0])
        else:
            print("\t".join(out.columns))
            for r in out.collect():
                print("\t".join("" if v is None else str(v) for v in r))
        return 0
    if args.format == "turtle":
        from .operators.turtle import (DEFAULT_PREFIXES, to_turtle_blocks,
                                       write_turtle)

        if args.output:
            write_turtle(result.triples, args.output)
        else:
            for k, v in sorted(DEFAULT_PREFIXES.items()):
                print(f"@prefix {k}: <{v}> .")
            for r in to_turtle_blocks(result.triples).orderBy(
                    "subj").collect():
                print(r["block"])
        return 0
    from .operators.ntriples import to_ntriples_lines, write_ntriples

    if args.canonical:
        from .kg.canon import canonical_ntriples

        lines = canonical_ntriples(result.triples)
        if args.output:
            lines.write.mode("overwrite").text(args.output)
        else:
            for r in lines.collect():
                print(r[0])
        return 0
    if args.output:
        write_ntriples(result.triples, args.output)
    else:
        for r in to_ntriples_lines(result.triples).collect():
            print(r[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
