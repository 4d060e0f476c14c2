"""EP3 CLI (node_synonymizer.py:438-483 + parser.py:5-63, L3): the
interactive lookup surface over Parquet synonymizer dims.

    python -m drugbankner_spark.cli --dims DIR CURIE_OR_NAME [-c|-e|-n]

Modes mirror the reference flags: ``-c`` canonical curies (curie-first,
name-fallback), ``-e`` equivalent nodes, ``-n`` normalizer records,
default = cluster table printout. ``--kg-version`` is validated with the
reference's X.Y.Z regex (parser.py:5-8) though the engine reads whatever
dims directory it is given.
"""

from __future__ import annotations

import argparse
import os
import re
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Synonymizer lookup (EP3)")
    p.add_argument("curie_or_name", help="entity to look up")
    p.add_argument("--dims", required=True,
                   help="directory with nodes/clusters/edges parquet "
                        "(see sources.sqlite_snapshot)")
    p.add_argument("--kg-version", default="2.10.0",
                   help="KG version tag (X.Y.Z)")
    mode = p.add_mutually_exclusive_group()
    mode.add_argument("-c", "--canonical", action="store_true")
    mode.add_argument("-e", "--equivalent", action="store_true")
    mode.add_argument("-n", "--normalizer", action="store_true")
    return p


def validate_kg_version(version: str) -> str:
    # parser.py:5-8 semantics: strict X.Y.Z
    if not re.fullmatch(r"\d+\.\d+\.\d+", version):
        raise SystemExit(f"invalid --kg-version {version!r}; expected X.Y.Z")
    return version


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    validate_kg_version(args.kg_version)

    from drugbankner_spark.operators.synonymizer import Synonymizer
    from drugbankner_spark.session import get_spark

    spark = get_spark(app_name="synonymizer-cli")
    read = lambda t: spark.read.parquet(os.path.join(args.dims, f"{t}.parquet"))  # noqa: E731
    syn = Synonymizer(read("nodes"), read("clusters"), read("edges"))
    entity = spark.createDataFrame([(args.curie_or_name,)], ["entity"])

    if args.canonical:
        out = syn.canonical_lookup(entity, "entity")
    elif args.equivalent:
        out = syn.equivalent_nodes(entity, "entity", explode=True)
    elif args.normalizer:
        out = syn.normalizer_nodes(entity, "entity")
    else:
        resolved = syn.canonical_lookup(entity, "entity").select(
            "preferred_curie"
        ).collect()
        cid = resolved[0]["preferred_curie"] if resolved else None
        if cid is None:
            print(f"Sorry, input concept {args.curie_or_name!r} is not "
                  f"recognized.")
            return 1
        want = spark.createDataFrame([(cid,)], ["cluster_id"])
        nodes_out, edges_out = syn.cluster_table(want)
        print(f"Cluster for {args.curie_or_name} ({cid}):")
        nodes_out.show(100, truncate=False)
        if edges_out is not None:
            edges_out.show(100, truncate=False)
        return 0

    out.show(100, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
