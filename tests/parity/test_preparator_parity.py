"""Data-preparator parity: the reference's torch preparators (lightning
import-stub) and rectools_tpu's host pipeline process identical interactions;
the resulting id maps, kept interactions, and collated training batches must
match. This pins the trickiest host logic — PAD-token id-map construction,
short-session filtering, session-tail truncation, shifted-sequence collation
and validation splitting."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def interactions() -> pd.DataFrame:
    rng = np.random.default_rng(4)
    n = 3000
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 80, n),
            "item_id": (rng.zipf(1.4, n) - 1) % 60,
            "weight": 1.0,
            "datetime": pd.to_datetime("2024-05-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="m"),
        }
    ).drop_duplicates(subset=["user_id", "datetime"])  # unique per-user order


SESSION_LEN = 8


def _ref_preparator(**kwargs):
    from rectools.models.nn.transformers.sasrec import SASRecDataPreparator

    return SASRecDataPreparator(
        session_max_len=SESSION_LEN, batch_size=16, dataloader_num_workers=0, shuffle_train=False, **kwargs
    )


def _tpu_preparator(**kwargs):
    from rectools_tpu.models.nn.transformers.sasrec import SASRecDataPreparator

    return SASRecDataPreparator(
        session_max_len=SESSION_LEN, batch_size=16, dataloader_num_workers=0, shuffle_train=False, **kwargs
    )


def _process_both(interactions, **kwargs):
    from rectools.dataset import Dataset as RefDataset

    from rectools_tpu.dataset import Dataset

    ref_prep = _ref_preparator(**kwargs)
    ref_prep.process_dataset_train(RefDataset.construct(interactions))
    tpu_prep = _tpu_preparator(**kwargs)
    tpu_prep.process_dataset_train(Dataset.construct(interactions))
    return ref_prep, tpu_prep


class TestProcessDatasetTrain:
    def test_item_id_maps_match(self, interactions) -> None:
        ref_prep, tpu_prep = _process_both(interactions)
        ref_items = list(ref_prep.train_dataset.item_id_map.external_ids)
        tpu_items = list(tpu_prep.train_dataset.item_id_map.external_ids)
        assert ref_items == tpu_items  # PAD first, then first-appearance order
        assert ref_prep.item_extra_tokens == tpu_prep.item_extra_tokens
        np.testing.assert_array_equal(
            ref_prep.get_known_items_sorted_internal_ids(),
            tpu_prep.get_known_items_sorted_internal_ids(),
        )

    def test_kept_interactions_match(self, interactions) -> None:
        ref_prep, tpu_prep = _process_both(interactions)
        ref_df = ref_prep.train_dataset.interactions.df
        tpu_df = tpu_prep.train_dataset.interactions.df
        cols = ["user_id", "item_id"]
        ref_sorted = ref_df.sort_values(cols + ["datetime"]).reset_index(drop=True)
        tpu_sorted = tpu_df.sort_values(cols + ["datetime"]).reset_index(drop=True)
        assert len(ref_sorted) == len(tpu_sorted)
        np.testing.assert_array_equal(ref_sorted["user_id"], tpu_sorted["user_id"])
        np.testing.assert_array_equal(ref_sorted["item_id"], tpu_sorted["item_id"])

    def test_min_user_interactions_filter_matches(self, interactions) -> None:
        ref_prep, tpu_prep = _process_both(interactions, train_min_user_interactions=5)
        assert len(ref_prep.train_dataset.user_id_map.external_ids) == len(
            tpu_prep.train_dataset.user_id_map.external_ids
        )
        assert set(ref_prep.train_dataset.user_id_map.external_ids) == set(
            tpu_prep.train_dataset.user_id_map.external_ids
        )

    def test_val_mask_split_matches(self, interactions) -> None:
        from rectools.models.nn.transformers.utils import leave_one_out_mask as ref_mask

        from rectools_tpu.models.nn.transformers import leave_one_out_mask as tpu_mask

        ref_prep, tpu_prep = _process_both(interactions, get_val_mask_func=ref_mask)
        _, tpu_prep2 = _process_both(interactions, get_val_mask_func=tpu_mask)
        assert len(ref_prep.train_dataset.interactions.df) == len(tpu_prep2.train_dataset.interactions.df)


class TestTrainCollationParity:
    def _torch_batches(self, prep):
        out = []
        for batch in prep.get_dataloader_train():
            if isinstance(batch, dict):
                out.append({k: np.asarray(v) for k, v in batch.items()})
            else:
                out.append({k: np.asarray(v) for k, v in zip(("x", "y", "yw"), batch)})
        return out

    def _tpu_batches(self, prep):
        rng = np.random.default_rng(0)
        return [dict(b) for b in prep.get_dataloader_train(rng)]

    def test_shifted_sequence_batches_match(self, interactions) -> None:
        ref_prep, tpu_prep = _process_both(interactions)
        ref_batches = self._torch_batches(ref_prep)
        tpu_batches = self._tpu_batches(tpu_prep)
        assert len(ref_batches) == len(tpu_batches)
        for ref_b, tpu_b in zip(ref_batches, tpu_batches):
            np.testing.assert_array_equal(ref_b["x"], tpu_b["x"])
            np.testing.assert_array_equal(ref_b["y"], tpu_b["y"])
            np.testing.assert_array_equal(ref_b["yw"], tpu_b["yw"])

    def test_recommend_collation_matches(self, interactions) -> None:
        from rectools.dataset import Dataset as RefDataset

        from rectools_tpu.dataset import Dataset

        ref_prep, tpu_prep = _process_both(interactions)
        ref_ds = RefDataset.construct(interactions)
        tpu_ds = Dataset.construct(interactions)
        ref_rec_ds = ref_prep.transform_dataset_u2i(ref_ds, interactions["user_id"].unique())
        tpu_rec_ds = tpu_prep.transform_dataset_u2i(tpu_ds, interactions["user_id"].unique(), None)

        ref_x = []
        for batch in ref_prep.get_dataloader_recommend(ref_rec_ds, 16):
            ref_x.append(np.asarray(batch["x"] if isinstance(batch, dict) else batch[0]))
        ref_x = np.concatenate(ref_x, axis=0)

        tpu_x = []
        loader = tpu_prep.get_dataloader_recommend(tpu_rec_ds, 16)
        for batch in loader:
            tpu_x.append(np.asarray(batch["x"]))
        tpu_x = np.concatenate(tpu_x, axis=0)
        np.testing.assert_array_equal(ref_x, tpu_x)


class TestBert4RecCollationParity:
    def test_recommend_collation_appends_mask(self, interactions) -> None:
        from rectools.dataset import Dataset as RefDataset
        from rectools.models.nn.transformers.bert4rec import BERT4RecDataPreparator as RefPrep

        from rectools_tpu.dataset import Dataset
        from rectools_tpu.models.nn.transformers.bert4rec import BERT4RecDataPreparator

        ref_prep = RefPrep(
            session_max_len=SESSION_LEN, batch_size=16, dataloader_num_workers=0, shuffle_train=False,
            mask_prob=0.15, n_negatives=None, train_min_user_interactions=2,
        )
        ref_prep.process_dataset_train(RefDataset.construct(interactions))
        tpu_prep = BERT4RecDataPreparator(
            session_max_len=SESSION_LEN, batch_size=16, dataloader_num_workers=0, shuffle_train=False,
            mask_prob=0.15,
        )
        tpu_prep.process_dataset_train(Dataset.construct(interactions))

        # id maps agree (PAD, MASK first)
        assert list(ref_prep.train_dataset.item_id_map.external_ids) == list(
            tpu_prep.train_dataset.item_id_map.external_ids
        )

        ref_ds = RefDataset.construct(interactions)
        tpu_ds = Dataset.construct(interactions)
        users = interactions["user_id"].unique()
        ref_rec = ref_prep.transform_dataset_u2i(ref_ds, users)
        tpu_rec = tpu_prep.transform_dataset_u2i(tpu_ds, users, None)

        ref_x = np.concatenate(
            [np.asarray(b["x"] if isinstance(b, dict) else b[0]) for b in ref_prep.get_dataloader_recommend(ref_rec, 16)],
            axis=0,
        )
        tpu_x = np.concatenate(
            [np.asarray(b["x"]) for b in tpu_prep.get_dataloader_recommend(tpu_rec, 16)], axis=0
        )
        # identical windows: right-truncated history + MASK appended last
        np.testing.assert_array_equal(ref_x, tpu_x)
