"""Two-stage pipeline: candidate generators + a trainable reranker.

Run: python examples/two_stage_ranking.py
(set RECTOOLS_PLATFORM=cpu|tpu to pin the jax platform; unreachable
configured platforms fall back to CPU so the example runs anywhere)
"""

import os

import jax

if os.environ.get("RECTOOLS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RECTOOLS_PLATFORM"])
else:
    try:
        jax.default_backend()
    except RuntimeError:  # configured platform unavailable (e.g. no TPU)
        jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd
from sklearn.ensemble import GradientBoostingClassifier

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.model_selection import TimeRangeSplitter
from rectools_tpu.models import ALSModel, PopularModel
from rectools_tpu.models.ranking import CandidateGenerator, CandidateRankingModel, Reranker


def main() -> None:
    rng = np.random.default_rng(0)
    rows = []
    for user in range(150):
        n = int(rng.integers(5, 15))
        for t, item in enumerate(rng.integers(0, 50, size=n)):
            rows.append((user, int(item), 1.0, pd.Timestamp("2024-01-01") + pd.Timedelta(days=t)))
    dataset = Dataset.construct(pd.DataFrame(rows, columns=Columns.Interactions))

    model = CandidateRankingModel(
        candidate_generators=[
            CandidateGenerator(
                PopularModel(), num_candidates=30, keep_ranks=True, keep_scores=True,
                scores_fillna_value=0.0, ranks_fillna_value=100.0,
            ),
            CandidateGenerator(
                ALSModel(factors=16, iterations=5, random_state=0), num_candidates=30,
                keep_ranks=True, keep_scores=True, scores_fillna_value=0.0, ranks_fillna_value=100.0,
            ),
        ],
        splitter=TimeRangeSplitter("3D", 1),
        reranker=Reranker(GradientBoostingClassifier(random_state=0)),
    )
    model.fit(dataset)
    reco = model.recommend(
        users=np.arange(20), dataset=dataset, k=10, filter_viewed=True, on_unsupported_targets="ignore"
    )
    print(reco.head(12))


if __name__ == "__main__":
    main()
