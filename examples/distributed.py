"""Multi-chip recipes: sharded training, solving and serving on one mesh.

Everything here runs on a virtual CPU mesh, so you can try it without TPU
hardware:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed.py

On a real TPU slice, drop the env vars — the same code spans the physical
chips (`jax.devices()`); multi-host pods additionally call
`jax.distributed.initialize()` first.
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax

try:
    backend = jax.default_backend()
except RuntimeError:  # configured platform unavailable (e.g. no TPU tunnel)
    backend = "unavailable"
if backend != "tpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models import ALSModel, SASRecModel
from rectools_tpu.models.rank import Distance, TPURanker
from rectools_tpu.parallel.mesh import make_mesh


def make_data(n_users: int = 2000, n_items: int = 500, n: int = 20000) -> Dataset:
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            Columns.User: rng.integers(0, n_users, n),
            Columns.Item: rng.integers(0, n_items, n),
            Columns.Weight: 1.0,
            Columns.Datetime: pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 90, n), unit="D"),
        }
    )
    return Dataset.construct(df)


def main() -> None:
    print(f"devices: {jax.device_count()} x {jax.devices()[0].platform}")
    dataset = make_data()

    # --- sharded classic training: ALS with the Gram psum + DP solve batches
    als = ALSModel(factors=32, iterations=3, random_state=0, mesh_shape=(4, 2))
    als.fit(dataset)
    print("ALS fitted on a (4 data x 2 model) mesh")

    # --- sharded transformer training: DP batches + TP embedding tables
    sasrec = SASRecModel(
        n_blocks=1, n_heads=2, n_factors=32, session_max_len=16, epochs=1,
        batch_size=32, seed=0, training_module_kwargs={"mesh_shape": (4, 2)},
    )
    sasrec.fit(dataset)
    print("SASRec fitted with DP x TP shardings")

    # --- sharded serving: catalog split over the model axis,
    #     query batches over the data axis, exact results
    user_vecs, item_vecs = als.get_vectors()
    mesh = make_mesh(n_data=4, n_model=2)
    ranker = TPURanker(Distance.DOT, user_vecs, item_vecs, mesh=mesh)
    subj, obj, scores = ranker.rank(np.arange(100), k=10)
    print(f"sharded ranker: {len(subj)} reco rows; each chip holds 1/2 of the catalog")

    single = TPURanker(Distance.DOT, user_vecs, item_vecs)
    s2, o2, sc2 = single.rank(np.arange(100), k=10)
    assert np.array_equal(obj, o2), "sharded serving must be exact"
    print("sharded == single-device: exact")


if __name__ == "__main__":
    main()
