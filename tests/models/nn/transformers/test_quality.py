"""Learning-quality tests: sequential models must exploit order structure
that non-sequential baselines cannot."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.metrics import HitRate
from rectools_tpu.models import PopularModel, SASRecModel


def _cyclic_dataset(n_users: int = 120, n_items: int = 12, session_len: int = 9):
    """Each user walks the item cycle i -> (i+1) % n_items from a random
    start: the next item is fully determined by the previous one."""
    rng = np.random.default_rng(5)
    rows = []
    test_rows = []
    for u in range(n_users):
        start = int(rng.integers(0, n_items))
        items = [(start + t) % n_items for t in range(session_len + 1)]
        for t, i in enumerate(items[:-1]):
            rows.append((u, i, 1.0, pd.Timestamp("2021-01-01") + pd.Timedelta(days=t)))
        test_rows.append((u, items[-1]))
    df = pd.DataFrame(rows, columns=Columns.Interactions)
    test = pd.DataFrame(test_rows, columns=[Columns.User, Columns.Item])
    return Dataset.construct(df), test


@pytest.mark.slow
def test_sasrec_learns_sequence_structure() -> None:
    dataset, test = _cyclic_dataset()
    model = SASRecModel(
        n_blocks=1,
        n_heads=1,
        n_factors=32,
        session_max_len=10,
        epochs=30,
        batch_size=64,
        lr=0.01,
        dropout_rate=0.0,
        seed=0,
    )
    model.fit(dataset)
    users = test[Columns.User].unique()
    reco = model.recommend(users, dataset, k=1, filter_viewed=False)
    sasrec_hit = HitRate(k=1).calc(reco, test)

    popular = PopularModel().fit(dataset)
    pop_reco = popular.recommend(users, dataset, k=1, filter_viewed=False)
    popular_hit = HitRate(k=1).calc(pop_reco, test)

    # the next item is deterministic given the last one: a sequence model must
    # get most of them right, a popularity baseline is at chance level
    assert sasrec_hit > 0.9, f"SASRec hit@1={sasrec_hit:.2f}"
    assert sasrec_hit > popular_hit + 0.5
