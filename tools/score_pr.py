"""Report triple extraction P/R vs goldens at a given sf (default 0.1).

Usage: python tools/score_pr.py [sf]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1

    from sigraph_spark.operators.scoring import score_corpus
    from sigraph_spark.session import build_session

    spark = build_session(app_name="score-pr")
    spark.sparkContext.setLogLevel("ERROR")
    out = score_corpus(spark, sf)
    out["sf"] = sf
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
