"""spark-submit entrypoint: format conversion (the reference's flagship
pipelines, SURVEY.md §3.3).

    pbf → apidb   (tests/test_pbf_reader_apidb_dump_writer_pipe.rs)
    apidb → pbf   (tests/test_apidb_dump_reader_pbf_writer_pipe.rs)
    pbf → pbf     (round-trip, tests/test_pbf_rw_pipe.rs)

One declarative Spark plan per direction: scan → (joins/aggregates) →
ordered encode → sink, with element counts printed in the golden-analysis
shape the reference asserts (data.count.{nodes,ways,relations}).

    spark-submit --py-files engine.zip -m osm_io_spark.jobs.convert -- \\
        --from pbf --to apidb --input fixture.osm.pbf --output /tmp/dump
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from ..session import get_spark


def run(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--from", dest="src_fmt", choices=["pbf", "apidb"],
                    required=True)
    ap.add_argument("--to", dest="dst_fmt", choices=["pbf", "apidb"],
                    required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--history", action="store_true",
                    help="write HistoricalInformation PBF (multi-version)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("osm-io-spark-convert", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    from .. import queries as Q
    from ..sources import apidb
    from ..sources.pbf import decode as PD
    from ..sources.pbf import encode as PE

    Q.ensure_shipped(spark)
    file_info = None
    if args.src_fmt == "pbf":
        els = PD.read_pbf(spark, args.input)
        # carry header metadata (source + osmosis replication state)
        # through pbf→pbf conversion — file_info.rs round-trip
        file_info = PD.read_header(args.input)
    else:
        els = apidb.elements_from_apidb(
            apidb.read_apidb_dump(spark, args.input))

    if args.dst_fmt == "pbf":
        PE.write_pbf(els, args.output, history=args.history,
                     file_info=file_info)
    else:
        apidb.write_apidb_dump(els, args.output)

    counts = {r["etype"]: r["n"] for r in
              els.groupBy("etype").agg(F.count("*").alias("n")).collect()}
    out = {"data": {"count": {
        "nodes": counts.get("node", 0),
        "ways": counts.get("way", 0),
        "relations": counts.get("relation", 0)}},
        "input": args.input, "output": args.output,
        "direction": f"{args.src_fmt}->{args.dst_fmt}"}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    run()
