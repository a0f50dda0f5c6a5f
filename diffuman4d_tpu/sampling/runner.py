"""SamplingRunner: the user-facing orchestration façade (reference:
src/samplers/sampling_runner.py:14-84).

The reference runner owns per-round task queues and one worker thread per
GPU (:26-43) with a barrier between rounds (:53-55). Here rounds are SPMD
waves over a device mesh (or plain sequential execution on one chip), and
the barrier is program order — but the public surface is kept:
``inference()`` / ``evaluate()`` / ``to_nerfstudio()``.
"""

from __future__ import annotations

import logging
import os.path as osp

from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler

log = logging.getLogger(__name__)


class SamplingRunner:
    def __init__(
        self,
        sampler: SlidingIterativeSampler,
        mesh=None,  # jax Mesh for SPMD waves; None = auto (all devices)
    ):
        self.sampler = sampler
        self.mesh = mesh

    def _resolve_mesh(self):
        if self.mesh is not None:
            return self.mesh
        # even on a single chip the wave path is the right default: its
        # prefetch overlaps the next task's host prep (file IO + condition
        # encode, minutes per task on slow hosts) with the in-flight denoise
        from diffuman4d_tpu.parallel.mesh import make_mesh

        return make_mesh()

    def inference(self) -> None:
        """All alternation rounds + completeness check
        (sampling_runner.py:45-62).

        Mesh layout decides the parallelism: the "data" axis runs task
        waves (SURVEY §2.4); a "model" axis > 1 context-parallelizes each
        window step's frame axis (parallel/cp_unet.py), so a mesh of
        (1, N) puts all chips on ONE task's latency."""
        mesh = self._resolve_mesh()
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            log.info(
                "context-parallel window steps over %d devices ('model' axis)"
                "%s",
                mesh.shape["model"],
                f" x {mesh.shape['data']} task waves ('data' axis)"
                if mesh.shape["data"] > 1 else "",
            )
            self.sampler.pipeline.enable_context_parallel(mesh)
            self.sampler.execute_tasks_parallel(mesh)
        elif mesh is not None:
            if mesh.shape["data"] > 1:
                log.info("SPMD sampling over %d devices", mesh.shape["data"])
            self.sampler.execute_tasks_parallel(mesh)
        else:
            self.sampler.execute_tasks()
        self._dump_phases()

    def _dump_phases(self) -> None:
        """Per-phase wall-clock table -> phases.json + job log (SURVEY §5
        observability; the reference only has tqdm bars)."""
        from diffuman4d_tpu.utils.tracing import dump_report, report

        rep = report()
        if rep:
            dump_report(osp.join(self.sampler.output_dir, "phases.json"))
            log.info("phase report: %s", rep)

    def evaluate(self, data_dir: str, scene_label: str, **kwargs) -> dict:
        """Masked PSNR/SSIM/LPIPS vs GT (sampling_runner.py:64-77)."""
        from diffuman4d_tpu.data.metrics import evaluate_results

        return evaluate_results(
            data_dir=data_dir,
            scene_label=scene_label,
            output_dir=self.sampler.output_dir,
            input_spa_labels=self.sampler.input_spa_labels,
            **kwargs,
        )

    def to_nerfstudio(self, scene_dir: str) -> str:
        """Export generated images for 3DGS/4DGS (sampling_runner.py:79-84)."""
        from diffuman4d_tpu.io.nerfstudio import export_to_nerfstudio

        return export_to_nerfstudio(
            scene_dir=scene_dir,
            output_dir=self.sampler.output_dir,
            input_spa_labels=self.sampler.input_spa_labels,
        )
