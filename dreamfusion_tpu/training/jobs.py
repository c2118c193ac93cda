"""Backend-driven training entry + experiment templates.

Rebuilds:
- frameworks/train_single_model.py:36-79 — `train_model(params)`: the job-side
  entry: seed, run the pipeline, log metrics + the model weight hash
  (determinism probe), save artifacts through the backend.
- frameworks/nerf/jobs_for_new_nerf.py — `params_for_nerf` experiment
  templates + `submit_nerf_jobs` random sweeps.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def train_model(params: Dict[str, Any]):
    """Job-side entry (launched via backend.submit('dreamfusion_tpu.training.'
    'jobs:train_model', params))."""
    from dreamfusion_tpu.utils import backend
    from dreamfusion_tpu.utils.tools import get_model_weight_hash, parse_params
    from dreamfusion_tpu.training.nerf_pipeline import train_nerf_models

    params = parse_params(params)
    seed = params.get("seed", 0)
    np.random.seed(seed)
    backend.log_params(params)

    result = train_nerf_models(params, log_fn=backend.log)
    backend.log_metric("test/psnr", result["test_psnr"])
    tr = result["fine_trainer"]
    whash = get_model_weight_hash(tr.params)
    backend.log(f"model weight hash: {whash}")
    if result.get("save_path") and os.path.exists(result["save_path"]):
        backend.save_artifact(result["save_path"])
    return result["test_psnr"]


def params_for_nerf(scene_dir: str, dataset_type: str = "blender",
                    save_name: Optional[str] = None, sweep: bool = False
                    ) -> Dict[str, Any]:
    """Experiment template (jobs_for_new_nerf.py:9-89). With sweep=True the
    list-valued entries become random_params choice points."""
    base: Dict[str, Any] = {
        "project_name": "new_nerf",
        "cfg_data": {"dataset_type": dataset_type, "datadir": scene_dir},
        "batch_size": 8192,
        "coarse_train": {"n_iters": 5000, "lr_density": 0.1, "lr_k0": 0.1},
        "fine_train": {"n_iters": 20000, "lr_density": 0.1, "lr_k0": 0.1,
                       "lr_rgbnet": 1e-3,
                       "pg_scale": (1000, 2000, 3000)},
        "fine_model": {"num_voxels": 160 ** 3, "rgbnet": "resmlp"},
        "save_name": save_name or os.path.join("ckpts", "scene.dvgo"),
    }
    if sweep:
        base["fine_train"]["lr_rgbnet"] = [1e-3, 3e-3, 1e-2]
        base["fine_model"]["rgbnet"] = ["resmlp", "basicmlp"]
        base["seed"] = [0, 1, 2]
    return base


def submit_nerf_jobs(scene_dir: str, number_jobs: int = 6, **kw):
    """(jobs_for_new_nerf.py:89)"""
    from dreamfusion_tpu.utils.tools import submit_jobs

    return submit_jobs(
        lambda: params_for_nerf(scene_dir, sweep=True, **kw),
        "dreamfusion_tpu.training.jobs:train_model",
        number_jobs=number_jobs, project_name="new_nerf")
