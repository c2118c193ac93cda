"""Job backend + experiment tooling tests."""

import json
import os

import numpy as np

from dreamfusion_tpu.utils import (get_model_weight_hash, parse_params,
                                   random_params, skip_if_excuted,
                                   submit_jobs)
from dreamfusion_tpu.utils.backend import LocalBackend


def test_random_params_grammar():
    np.random.seed(0)
    spec = {"lr": [1e-3, 1e-4], "arch": ("a", ["b", "c"]),
            "layers_no_choice": [1, 2, 3], "fixed": 5}
    out = random_params(spec)
    assert out["lr"] in (1e-3, 1e-4)
    assert out["arch"][0] == "a" and out["arch"][1] in ("b", "c")
    assert out["layers"] == [1, 2, 3]          # protected list
    assert out["fixed"] == 5


def test_parse_params_aliases():
    p = parse_params({"lr": 0.01, "dataset": "nerf",
                      "devices": 4,
                      "dataset_dummy": 0})
    assert p["learning_rate"] == p["max_lr"] == 0.01
    assert p["backend"] == "shard_map"
    assert p["dataset"]["name"] == "nerf"
    p2 = parse_params({"dataset": {"name": "nerf", "total_batch_size": 64},
                       "devices": 4})
    assert p2["dataset"]["batch_size"] == 16


def test_weight_hash_deterministic():
    params = {"a": np.arange(5.0), "b": {"c": np.ones((2, 2))}}
    h1 = get_model_weight_hash(params)
    h2 = get_model_weight_hash({"a": np.arange(5.0), "b": {"c": np.ones((2, 2))}})
    assert h1 == h2
    h3 = get_model_weight_hash({"a": np.arange(5.0) + 1, "b": {"c": np.ones((2, 2))}})
    assert h1 != h3


def test_skip_if_excuted():
    calls = []

    @skip_if_excuted
    def f(x):
        calls.append(x)
        return x * 2

    assert f(3) == 6
    assert f(3) == 6
    assert calls == [3]
    assert f(4) == 8
    assert calls == [3, 4]


def test_local_backend_submit_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    be = LocalBackend(root=str(tmp_path / "jobs"))
    rc = be.submit("dreamfusion_tpu.utils.backend:_test_job_entry", {"x": 21})
    assert rc == 0
    # find the metrics file the job wrote
    found = []
    for root, _, files in os.walk(tmp_path / "jobs"):
        for f in files:
            if f == "metrics.jsonl":
                found.append(os.path.join(root, f))
    assert found
    rec = json.loads(open(found[0]).read().strip())
    assert rec["result"] == 42.0


def test_submit_jobs_dedupes(tmp_path):
    class FakeBackend:
        def __init__(self):
            self.jobs = []

        def submit(self, cmd, params):
            self.jobs.append(params)

        def log(self, *a):
            pass

    np.random.seed(0)
    be = FakeBackend()
    submitted = submit_jobs(lambda: {"lr": [1, 2, 3]}, "mod:fn",
                            number_jobs=3, backend=be)
    lrs = sorted(j["lr"] for j in be.jobs)
    assert len(set(lrs)) == 3  # deduped
