"""Pluggable job backend (reference: utils/backend.py + local/atlas/kube).

Selection (reference: utils/backend.py:2-12): env LOCAL_BACKEND=1 or default
-> local; marker file `use_kubernets.backend` -> kubernetes; env
ATLAS_BACKEND=1 -> atlas. All expose the same API:

    submit(function_path, params)  — launch a training job
    load_parameters()              — job side: fetch its params dict
    log_params(params) / log_metric(key, value) / log(msg)
    save_artifact(path, name) / set_tensorboard_logdir(path)

The local backend pickles params and launches a subprocess
(utils/local_backend.py:50-58); the kubernetes backend preserves the
reference's retry-on-infra-error loop (utils/kubernetes_runner.py:168-177)
around a kubectl-based runner; atlas is a thin stub (the Atlas/foundations
service is proprietary).
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
import subprocess
import sys
import time
from typing import Any, Dict, Optional

_PARAM_ENV = "DFTPU_PARAMS_FILE"
_WORKDIR_ENV = "DFTPU_JOB_DIR"

# error signatures that trigger a retry (utils/kubernetes_runner.py:92-98,
# adapted to TPU failure modes)
RETRYABLE_ERRORS = (
    "out of memory",
    "No GPUs available.",
    "CUDNN_STATUS_INTERNAL_ERROR",
    "TPU device error",
    "UNAVAILABLE",
)


class LocalBackend:
    """Run jobs as local subprocesses (reference: utils/local_backend.py)."""

    name = "local"

    def __init__(self, root: Optional[str] = None):
        self.root = root or os.environ.get("DFTPU_JOBS_ROOT", "jobs")

    def _job_dir(self) -> str:
        d = os.path.join(self.root, time.strftime("%Y%m%d_%H%M%S_")
                         + str(os.getpid()))
        os.makedirs(d, exist_ok=True)
        return d

    def submit(self, function_path: str, params: Dict[str, Any],
               blocking: bool = True) -> int:
        """function_path: 'module:function' taking a params dict."""
        job_dir = self._job_dir()
        pfile = os.path.join(job_dir, "params.pkl")
        with open(pfile, "wb") as f:
            pickle.dump(params, f)
        mod, fn = function_path.split(":")
        code = (f"import {mod}; from dreamfusion_tpu.utils import backend; "
                f"{mod}.{fn}(backend.load_parameters())")
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        pypath = os.pathsep.join(
            p for p in [pkg_root, os.environ.get("PYTHONPATH", "")] if p)
        env = dict(os.environ, **{_PARAM_ENV: pfile, _WORKDIR_ENV: job_dir,
                                  "PYTHONPATH": pypath})
        proc = subprocess.Popen([sys.executable, "-c", code], env=env)
        if blocking:
            return proc.wait()
        return proc.pid

    # job-side API --------------------------------------------------------------
    @staticmethod
    def load_parameters() -> Dict[str, Any]:
        pfile = os.environ.get(_PARAM_ENV)
        if pfile and os.path.exists(pfile):
            if pfile.endswith((".yaml", ".yml")):   # kube jobs ship yaml
                import yaml

                with open(pfile) as f:
                    return yaml.safe_load(f).get("params", {})
            with open(pfile, "rb") as f:
                return pickle.load(f)
        return {}

    def _meta_path(self, name: str) -> str:
        d = os.environ.get(_WORKDIR_ENV, self.root)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, name)

    def log_params(self, params: Dict[str, Any]):
        with open(self._meta_path("params.json"), "w") as f:
            json.dump({k: repr(v) for k, v in params.items()}, f, indent=1)

    def log_metric(self, key: str, value):
        with open(self._meta_path("metrics.jsonl"), "a") as f:
            f.write(json.dumps({key: float(value), "time": time.time()}) + "\n")

    def save_artifact(self, path: str, name: Optional[str] = None):
        dst = self._meta_path(name or os.path.basename(path))
        if os.path.abspath(path) != os.path.abspath(dst):
            shutil.copy(path, dst)

    def set_tensorboard_logdir(self, path: str):
        with open(self._meta_path("tensorboard.txt"), "w") as f:
            f.write(path)

    def log(self, *args):
        print("[backend]", *args)


class KubernetesBackend(LocalBackend):
    """Kubernetes job runner: per-job Deployment created via kubectl, code
    copied in, command exec'd with log streaming + infra-error
    classification (OOM / no-accelerator / CUDNN / TPU RESOURCE_EXHAUSTED),
    teardown in finally, <=10 retries with backoff (reference:
    utils/kubernetes_backend.py + kubernetes_runner.py:17-177). The heavy
    lifting lives in utils/kube.py; kubectl binary, image, and namespace
    come from env so tests can inject a scripted fake kubectl."""

    name = "kubernetes"
    max_retries = 10
    retry_sleep = 60.0

    def __init__(self, root: Optional[str] = None):
        super().__init__(root)
        self.kubectl = os.environ.get("DFTPU_KUBECTL", "kubectl")
        self.namespace = os.environ.get("DFTPU_KUBE_NAMESPACE", "default")
        self.image = os.environ.get("DFTPU_KUBE_IMAGE",
                                    "dreamfusion-tpu:latest")
        self.num_accelerators = int(os.environ.get("DFTPU_KUBE_ACCELS", "1"))

    def submit(self, function_path: str, params: Dict[str, Any],
               blocking: bool = True) -> int:
        from dreamfusion_tpu.utils import kube

        if not kube.kubectl_available(self.kubectl):
            raise RuntimeError(
                "kubernetes backend selected but kubectl is not available; "
                "remove use_kubernets.backend or set LOCAL_BACKEND=1")
        job_dir = self._job_dir()
        job_id = os.path.basename(job_dir).replace("_", "-").lower()
        # job-side params ride in as a yaml file next to the code
        # (reference: kube_job_parameters.yaml, kubernetes_runner.py:147-148)
        import yaml

        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        def yaml_safe(v):
            # raw values round-trip through yaml (so the job receives 0.001
            # as a float, matching LocalBackend's pickle and the reference's
            # raw yaml.dump, kubernetes_backend.py:59-64); only values yaml
            # can't represent fall back to repr
            try:
                yaml.safe_dump(v)
                return v
            except yaml.YAMLError:
                return repr(v)

        with open(os.path.join(job_dir, "kube_job_parameters.yaml"),
                  "w") as f:
            yaml.safe_dump({"function_path": function_path,
                            "params": {k: yaml_safe(v)
                                       for k, v in params.items()}}, f)
        mod, fn = function_path.split(":")
        command = (f"python -c 'import {mod}; from dreamfusion_tpu.utils "
                   f"import backend; {mod}.{fn}("
                   f"backend.load_parameters())'")
        manifest = kube.make_deployment_manifest(
            job_id, image=self.image,
            num_accelerators=self.num_accelerators,
            namespace=self.namespace,
            env={_PARAM_ENV: "/job/job_source/kube_job_parameters.yaml"})
        runner = kube.KubeRunner(namespace=self.namespace,
                                 kubectl=self.kubectl, backend=self)
        try:
            kube.submit_kube_job(job_id, manifest, runner=runner,
                                 job_directory=pkg_root, command=command,
                                 workdir=job_dir,
                                 max_retries=self.max_retries,
                                 retry_sleep=self.retry_sleep)
            return 0
        except RuntimeError as e:
            self.log(str(e))
            return 1


class AtlasBackend(LocalBackend):
    """Atlas/foundations stub with metric clipping
    (reference: utils/atlas_backend.py:9-31)."""

    name = "atlas"

    def log_metric(self, key: str, value):
        v = float(value)
        v = max(min(v, 1e38), -1e38)  # atlas clips extreme metrics
        super().log_metric(key, v)


def _test_job_entry(params):
    """Self-test hook: double params['x'] into a metric (used by tests)."""
    log_metric("result", params["x"] * 2)


def _select_backend():
    if os.path.exists("use_kubernets.backend"):
        return KubernetesBackend()
    if os.environ.get("ATLAS_BACKEND"):
        return AtlasBackend()
    return LocalBackend()


_impl = _select_backend()

submit = _impl.submit
load_parameters = _impl.load_parameters
log_params = _impl.log_params
log_metric = _impl.log_metric
save_artifact = _impl.save_artifact
set_tensorboard_logdir = _impl.set_tensorboard_logdir
log = _impl.log
