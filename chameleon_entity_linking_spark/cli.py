"""spark-submit / python -m entry point.

Usage (local):
    python -m chameleon_entity_linking_spark.cli \
        --workdir /tmp/celsw --entities 2000 --seed 42 --cores 8

On a cluster the same module ships via
    spark-submit --py-files cel_spark.zip -m chameleon_entity_linking_spark.cli ...
(the package is pure Python; ``--py-files`` a zip of the package dir).

Stages resume from the last committed catalog snapshot — re-running
the same command after a crash recomputes only missing stages
(the --start_index analogue, `utils/entity_extractor.py:12,:51`).
"""

from __future__ import annotations

import argparse
import json
import sys

from chameleon_entity_linking_spark.operators.block import BlockConfig
from chameleon_entity_linking_spark.operators.score import ScoreConfig
from chameleon_entity_linking_spark.plans.pipeline import Pipeline
from chameleon_entity_linking_spark.plans.session import get_spark
from chameleon_entity_linking_spark.sources.synth import SynthConfig


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="entity-resolution pipeline")
    ap.add_argument("--workdir", required=True, help="catalog warehouse dir")
    ap.add_argument("--entities", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--hot-key-cap", type=int, default=None)
    ap.add_argument("--no-eval", action="store_true")
    args = ap.parse_args(argv)

    spark = get_spark(
        cores=args.cores, shuffle_partitions=args.shuffle_partitions
    )
    score_cfg = ScoreConfig()
    if args.threshold is not None:
        score_cfg.threshold = args.threshold
    block_cfg = BlockConfig()
    if args.hot_key_cap is not None:
        block_cfg.hot_key_cap = args.hot_key_cap
    pipe = Pipeline(
        spark,
        args.workdir,
        synth_cfg=SynthConfig(n_entities=args.entities, seed=args.seed),
        block_cfg=block_cfg,
        score_cfg=score_cfg,
    )
    result = pipe.run(evaluate=not args.no_eval)
    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
