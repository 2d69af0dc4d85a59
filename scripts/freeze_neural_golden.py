"""Regenerate the frozen kg_edges_neural row-level goldens from the
INDEPENDENT recompute (tests/test_neural.independent_neural_edges —
DuckDB corpus derivation + NumPy deterministic kernel, no Spark).

Run after any intentional change to the neural kernel or the corpus:
    python scripts/freeze_neural_golden.py
then re-run pytest: the drift guards
(test_neural_edges_golden_matches_independent_recompute and
test_neural_pipeline_matches_golden_bitwise) re-verify both sides."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_neural import GOLDEN_DIR, independent_neural_edges


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sf in ["sf0.001", "sf0.01"]:
        df = independent_neural_edges(f"/root/testdata/{sf}")
        path = f"{GOLDEN_DIR}/neural_edges_{sf}.parquet"
        df.to_parquet(path, index=False)
        print(f"{path}: {len(df)} rows, "
              f"prob_avg[0]={df['prob_avg'].iloc[0]!r}")


if __name__ == "__main__":
    main()
