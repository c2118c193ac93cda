"""Cluster/job orchestration layer (L7).

Rebuilds the reference's utils/ stack: a uniform backend API
{submit, load_parameters, log_params, log_metric, save_artifact,
set_tensorboard_logdir, log} selected at import time
(reference: utils/backend.py:2-12), with a local subprocess backend
(utils/local_backend.py), stubs for Atlas/Kubernetes with retry semantics
(utils/kubernetes_runner.py), and the experiment tooling in utils/tools.py
(submit_jobs dedupe loop, random_params sweeps, parse_params defaulting).
"""

from dreamfusion_tpu.utils import backend  # noqa: F401
from dreamfusion_tpu.utils.tools import (  # noqa: F401
    submit_jobs, random_params, parse_params, get_model_weight_hash,
    skip_if_excuted)
