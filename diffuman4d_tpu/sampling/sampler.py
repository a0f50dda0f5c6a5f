"""Sliding-iterative sampler: owns the camera x frame latent grid and the
alternation-round task schedule (reference:
src/samplers/sliding_iterative_sampler.py:15-212).

TPU-first redesign:
  * the latent grid is one device-resident array (S, T, h, w, 4) plus an
    int32 (S, T) timestep-index grid — no host round-trips between tasks
    (the reference bounces every latent through CPU RAM under a thread
    lock, sliding_iterative_sampler.py:181-185)
  * grid noise is seeded per (camera, frame) cell, so results are
    independent of task execution order by construction (the lock-ordering
    question the reference answers with "tasks in a round are disjoint"
    disappears)
  * tasks within a round are independent (reference proof: the runner
    executes them from a queue in any order) — execute_round() can batch
    ``tasks_per_wave`` of them into one pjit over a device mesh
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

from diffuman4d_tpu.data.dataset import Sample, SpaTemDataset
from diffuman4d_tpu.sampling.outputs import (
    check_sampling_results,
    save_debug_grid,
    save_final_images,
)
from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline
from diffuman4d_tpu.sampling.windows import build_windows
from diffuman4d_tpu.utils.arrays import fast_stack


@dataclass
class Task:
    alt: int  # 1-based alternation round
    domain: str  # "spatial" | "temporal"
    domain_label: str  # frame label (spatial) or target camera label (temporal)


class SlidingIterativeSampler:
    def __init__(
        self,
        dataset: SpaTemDataset,
        pipeline: Diffuman4DPipeline,
        output_dir: str = "./results/debug",
        spa_label_range: tuple[int, int, int] | None = (0, 48, 1),
        tem_label_range: tuple[int, int, int] | None = (0, 150, 1),
        spa_labels: list[int] | None = None,
        tem_labels: list[int] | None = None,
        input_spa_labels: list[int] = (1, 13, 25, 37),
        seed: int = 0,
        save_debug_grids: bool = False,
        save_crop_params: bool = False,
        resume: bool = True,
        checkpoint_rounds: bool = True,
        checkpoint_every_tasks: int = 24,
        task_budget: int | None = None,
        time_budget_s: float | None = None,
    ):
        # task_budget: stop (cleanly) after this many tasks in THIS
        # invocation, saving an intra-round grid_state for resume — lets a
        # long demo_4d run be split across bounded sessions/restarts. The
        # count is deterministic across hosts (same wave sizes), so every
        # process takes the stop branch together.
        #
        # time_budget_s: additionally stop after the first task that
        # completes past this wall-clock budget (measured from execute
        # start). SINGLE-PROCESS ONLY: a clock-based branch is not
        # deterministic across hosts, so multi-host runs must size
        # sessions with task_budget instead (enforced at execute time).
        self.task_budget = task_budget
        self.time_budget_s = time_budget_s
        self._exec_t0: float | None = None
        self._tasks_run = 0
        self.checkpoint_rounds = checkpoint_rounds
        # intra-round checkpoint cadence (0 = rounds only). Task-count
        # based, NOT time-based: every process must take the same branch
        # or the multi-host replicate_to_host collective deadlocks.
        self.checkpoint_every_tasks = checkpoint_every_tasks
        self.save_crop_params = save_crop_params
        self.dataset = dataset
        self.pipeline = pipeline
        self.output_dir = output_dir
        self.seed = seed
        if save_debug_grids and not getattr(dataset, "target_pixels", True):
            raise ValueError(
                "save_debug_grids needs GT target pixels; construct the "
                "dataset with target_pixels=True"
            )
        self.save_debug_grids = save_debug_grids
        cfg = pipeline.sliding

        # label materialization: "%02d" cameras, "%06d" frames
        # (sliding_iterative_sampler.py:49-66)
        if spa_labels is not None:
            self.spa_labels = [f"{int(i):02d}" for i in spa_labels]
        else:
            b, e, s = spa_label_range
            self.spa_labels = [f"{int(i):02d}" for i in range(b, e, s)]
        if tem_labels is not None:
            self.tem_labels = [f"{int(i):06d}" for i in tem_labels]
        else:
            b, e, s = tem_label_range
            self.tem_labels = [f"{int(i):06d}" for i in range(b, e, s)]
        self.input_spa_labels = [f"{int(i):02d}" for i in input_spa_labels]
        self.target_spa_labels = [
            s for s in self.spa_labels if s not in self.input_spa_labels
        ]

        # config invariants (sliding_iterative_sampler.py:71-88)
        if cfg.window_size > len(self.target_spa_labels):
            raise ValueError(
                f"window_size ({cfg.window_size}) > num target cameras "
                f"({len(self.target_spa_labels)})"
            )
        if len(self.target_spa_labels) % cfg.sliding_stride != 0:
            raise ValueError("num target cameras % sliding_stride != 0")
        if len(self.tem_labels) % cfg.sliding_stride != 0:
            raise ValueError("num frames % sliding_stride != 0")
        if cfg.alternation_rounds > 1 and cfg.window_size > len(self.tem_labels):
            raise ValueError(
                "window_size must be <= num frames when alternation_rounds > 1"
            )

        self._spa_index = {s: i for i, s in enumerate(self.spa_labels)}
        self._tem_index = {t: i for i, t in enumerate(self.tem_labels)}

        # the spatio-temporal latent grid, deterministic per-cell noise
        S, T = len(self.spa_labels), len(self.tem_labels)
        ss, tt = np.meshgrid(np.arange(S), np.arange(T), indexing="ij")
        noise = pipeline.init_noise(ss.reshape(-1), tt.reshape(-1), seed)
        self.grid_latents = noise.reshape(
            (S, T, pipeline.latent_size, pipeline.latent_size, pipeline.latent_channels)
        )
        self.grid_t_idx = np.zeros((S, T), np.int32)
        # multistep schedulers (dpm++) carry per-latent history in the grid
        self.grid_aux = None
        if pipeline.scheduler.has_aux:
            flat_aux = pipeline.scheduler.init_aux(
                (S * T, pipeline.latent_size, pipeline.latent_size,
                 pipeline.latent_channels)
            )
            import jax

            self.grid_aux = jax.tree.map(
                lambda a: a.reshape((S, T) + a.shape[1:]), flat_aux
            )

        self.all_tasks = self.prepare_tasks()
        self._completed_rounds = 0
        self._resume_tasks_done = 0
        # (spa, tem) labels this process wrote final images for — the
        # multi-process completeness check unions these across processes
        # (each process saves only its own tasks' outputs)
        self._saved_cells: set[tuple[str, str]] = set()
        # async output saver (created per execution path)
        self._saver = None
        self._save_futs: list = []
        # host mirror of the grid for cheap checkpoints (see save_state);
        # seeded lazily (free at resume — the state file's bytes) and kept
        # fresh by _mirror_update at every grid write-back
        self._host_mirror: dict | None = None
        if resume and self._try_resume():
            pass

    # -- sampling-state checkpointing -----------------------------------
    # The reference keeps the latent grid only in RAM: a killed run loses
    # everything but fully-written images (SURVEY §5). Here each completed
    # alternation round persists (latents, timestep indices) so runs resume
    # at round granularity.
    @property
    def _state_path(self) -> str:
        import os.path as osp

        return osp.join(self.output_dir, "state", "grid_state.d4d")

    @property
    def _legacy_state_path(self) -> str:
        import os.path as osp

        return osp.join(self.output_dir, "state", "grid_state.npz")

    # -- host mirror -----------------------------------------------------
    # The relay's device->host path runs at ~18 MB/s (measured r5:
    # fetching the 0.9 GB demo_4d grid = 49-51 s per checkpoint even as
    # raw bf16 bits). Single-process runs therefore keep a HOST MIRROR of
    # the grid: one full fetch seeds it (at resume it seeds free from the
    # state file's bytes), then each wave folds in only its own cells
    # (~13 MB/task, transfer started async behind the wave's denoise).
    # save_state then writes the mirror — disk-bound, no big D2H.
    @staticmethod
    def _to_host_bits(x) -> np.ndarray:
        """Device array -> host numpy, bf16 as uint16 bit patterns."""
        import jax

        if getattr(x, "dtype", None) == jnp.bfloat16:
            x = jax.lax.bitcast_convert_type(x, jnp.uint16)
        return np.asarray(x)

    def _mirror_names(self) -> list[str]:
        names = ["latents"]
        if self.grid_aux is not None:
            names += [f"aux_{k}" for k in self.grid_aux]
        return names

    def _mirror_grids(self) -> dict:
        grids = {"latents": self.grid_latents}
        if self.grid_aux is not None:
            grids.update({f"aux_{k}": v for k, v in self.grid_aux.items()})
        return grids

    def _seed_mirror_from_device(self) -> None:
        """One full-grid fetch (once per session; ~50 s for demo_4d)."""
        from diffuman4d_tpu.parallel.distributed import replicate_to_host

        # np.array copy: replicate_to_host returns jax's read-only host
        # view; the mirror needs its own writable buffer
        self._host_mirror = {
            name: np.array(replicate_to_host(g, raw_bf16=True))
            for name, g in self._mirror_grids().items()
        }

    def _mirror_update(self, spa: np.ndarray, tem: np.ndarray,
                       updates: dict) -> None:
        """Fold one task's cells into the mirror. ``updates`` maps mirror
        name -> device (or host) array of shape (len(spa), ...)."""
        if self._host_mirror is None:
            return
        for name, val in updates.items():
            self._host_mirror[name][spa, tem] = self._to_host_bits(val)

    def _budget_out(self) -> bool:
        """True when this invocation should stop cleanly after the current
        task/wave: task_budget tasks executed, or wall clock past
        time_budget_s (single-process only; enforced at execute start)."""
        if self.task_budget is not None and self._tasks_run >= self.task_budget:
            return True
        return (
            self.time_budget_s is not None
            and self._exec_t0 is not None
            and time.perf_counter() - self._exec_t0 > self.time_budget_s
        )

    def save_state(self, tasks_done: int = 0) -> None:
        """Persist the grid. ``tasks_done`` > 0 marks an intra-round
        checkpoint: that many tasks of round ``_completed_rounds`` (0-based
        next round) are already scattered into the grid, so resume skips
        them. Tasks within a round touch disjoint grid cells and use
        per-(round, task-index) deterministic keys, so a prefix count fully
        identifies the state (the reference loses everything on a kill —
        its grid lives only in RAM, sliding_iterative_sampler.py:181-185).

        Cost: bf16 grids are stored as raw uint16 bit patterns in a
        raw-blob container (io/gridstate.py) with one large write per
        array. Single-process runs source the bytes from the incrementally
        maintained host mirror (no big D2H at all — see _mirror_update);
        multi-process runs fall back to the collective fetch. The old
        fp32-cast + np.savez path wrote the 1.8 GB demo_4d grid at
        ~6.4 MB/s (280 s, prefix_r4)."""
        import jax

        from diffuman4d_tpu.io.gridstate import write_state
        from diffuman4d_tpu.parallel.distributed import replicate_to_host
        from diffuman4d_tpu.utils.tracing import phase

        multi = jax.process_count() > 1
        grids = self._mirror_grids()
        bf16_names = [
            n for n, g in grids.items()
            if getattr(g, "dtype", None) == jnp.bfloat16
        ]
        with phase("save_state/d2h", sync=False):
            if multi:
                # every process participates in the reshard collective;
                # only process 0 writes
                arrays = {
                    n: self._to_host_bits(replicate_to_host(g, raw_bf16=True))
                    for n, g in grids.items()
                }
            else:
                if self._host_mirror is None:
                    self._seed_mirror_from_device()
                arrays = self._host_mirror
        if jax.process_index() != 0:
            return
        arrays = dict(arrays)
        arrays["t_idx"] = np.ascontiguousarray(self.grid_t_idx)
        meta = {
            "seed": self.seed,
            "completed_rounds": int(self._completed_rounds),
            "tasks_done_in_round": int(tasks_done),
            "bf16_bits": bf16_names,
        }
        with phase("save_state/write", sync=False):
            write_state(self._state_path, meta, arrays)

    def _try_resume(self) -> bool:
        import os.path as osp

        if osp.isfile(self._state_path):
            return self._resume_from_d4d()
        if osp.isfile(self._legacy_state_path):
            return self._resume_from_npz()
        return False

    def _restore_aux(self, keys, get) -> bool:
        """Common aux restore: ``keys`` = aux names present in the state,
        ``get(k)`` -> device-ready array for aux key ``k``."""
        if self.grid_aux is None:
            return True
        if set(keys) != set(self.grid_aux):
            print("[sampler] state lacks multistep history — ignoring state")
            return False
        self.grid_aux = {k: get(k) for k in self.grid_aux}
        return True

    def _resume_from_d4d(self) -> bool:
        import jax

        from diffuman4d_tpu.io.gridstate import read_state

        meta, data = read_state(self._state_path)
        if int(meta["seed"]) != self.seed or tuple(
            data["latents"].shape
        ) != tuple(self.grid_latents.shape):
            print("[sampler] found grid state with mismatched seed/shape — ignoring")
            return False
        bf16 = set(meta.get("bf16_bits", []))

        def to_dev(name, dtype):
            a = jnp.asarray(np.ascontiguousarray(data[name]))
            if name in bf16:
                a = jax.lax.bitcast_convert_type(a, jnp.bfloat16)
            return a.astype(dtype)

        if not self._restore_aux(
            [k[4:] for k in data if k.startswith("aux_")],
            lambda k: to_dev(f"aux_{k}", self.grid_aux[k].dtype),
        ):
            return False
        self.grid_latents = to_dev("latents", self.grid_latents.dtype)
        self.grid_t_idx = np.array(data["t_idx"], np.int32)
        # seed the host mirror for free from the file's own bytes — but
        # only when they bit-match the live grids (u16 bits <-> bf16 grid,
        # or plain matching dtype)
        import jax

        if jax.process_count() == 1:
            grids = self._mirror_grids()
            if all(
                (n in bf16 and grids[n].dtype == jnp.bfloat16)
                or (n not in bf16 and data[n].dtype == grids[n].dtype)
                for n in self._mirror_names()
            ):
                self._host_mirror = {
                    n: np.array(data[n]) for n in self._mirror_names()
                }
        self._completed_rounds = int(meta["completed_rounds"])
        self._resume_tasks_done = int(meta.get("tasks_done_in_round", 0))
        print(
            f"[sampler] resumed after round {self._completed_rounds}"
            + (f" + {self._resume_tasks_done} tasks"
               if self._resume_tasks_done else "")
        )
        return True

    def _resume_from_npz(self) -> bool:
        """Legacy np.savez states (pre-r5 runs)."""
        data = np.load(self._legacy_state_path)
        if int(data["seed"]) != self.seed or data["latents"].shape != tuple(
            self.grid_latents.shape
        ):
            print("[sampler] found grid state with mismatched seed/shape — ignoring")
            return False
        if not self._restore_aux(
            [k[4:] for k in data.files if k.startswith("aux_")],
            lambda k: jnp.asarray(data[f"aux_{k}"], self.grid_aux[k].dtype),
        ):
            return False
        self.grid_latents = jnp.asarray(data["latents"], self.grid_latents.dtype)
        self.grid_t_idx = data["t_idx"].astype(np.int32)
        self._completed_rounds = int(data["completed_rounds"])
        self._resume_tasks_done = (
            int(data["tasks_done_in_round"])
            if "tasks_done_in_round" in data.files else 0
        )
        print(
            f"[sampler] resumed after round {self._completed_rounds}"
            + (f" + {self._resume_tasks_done} tasks"
               if self._resume_tasks_done else "")
        )
        return True

    def validate_grid(self, after_rounds: int) -> None:
        """Grid-wide consistency check between rounds: every target cell
        must sit exactly at rounds * steps_per_alt; every input-camera cell
        at 0. The SPMD analog of the reference's per-task assertions
        (pipeline_diffuman4d.py:480-487, 546-551) — any scheduling or
        write-back bug across devices/waves trips this loudly."""
        expected = after_rounds * self.pipeline.sliding.steps_per_alt
        tgt_rows = [self._spa_index[s] for s in self.target_spa_labels]
        inp_rows = [self._spa_index[s] for s in self.input_spa_labels]
        tgt = self.grid_t_idx[tgt_rows]
        if (tgt != expected).any():
            raise ValueError(
                f"grid inconsistent after round {after_rounds}: target cells "
                f"at {np.unique(tgt)}, expected {expected}"
            )
        if (self.grid_t_idx[inp_rows] != 0).any():
            raise ValueError("grid inconsistent: input-camera cells advanced")
        import jax

        fin = jax.jit(lambda g: jnp.isfinite(g.astype(jnp.float32)).all())(
            self.grid_latents
        )
        if not bool(np.asarray(fin.addressable_data(0))):
            raise ValueError("grid contains non-finite latents")

    # ------------------------------------------------------------------
    def prepare_tasks(self) -> list[list[Task]]:
        """Round i alternates spatial/temporal
        (sliding_iterative_sampler.py:192-199)."""
        rounds = self.pipeline.sliding.alternation_rounds
        domains = (["spatial", "temporal"] * rounds)[:rounds]
        all_tasks = []
        for i, domain in enumerate(domains):
            labels = self.tem_labels if domain == "spatial" else self.target_spa_labels
            all_tasks.append([Task(i + 1, domain, lb) for lb in labels])
        return all_tasks

    def _grid_cells(self, labels) -> tuple[np.ndarray, np.ndarray]:
        spa = np.asarray([self._spa_index[lb[1]] for lb in labels])
        tem = np.asarray([self._tem_index[lb[2]] for lb in labels])
        return spa, tem

    def load_sample(self, task: Task) -> Sample:
        """Assemble the task's sequence (sliding_iterative_sampler.py:102-153)."""
        if task.domain == "spatial":
            spa_labels = self.spa_labels
            tem_labels = [task.domain_label]
        else:
            spa_labels = [task.domain_label]
            tem_labels = self.tem_labels
        sample = self.dataset.get_item(
            scene_label=self.dataset.scene_label,
            spa_labels=spa_labels,
            tem_labels=tem_labels,
            input_spa_labels=self.input_spa_labels,
        )
        if task.domain == "temporal":
            n = len(sample.labels)
            cm = np.ones(n, np.float32)
            cm[: n // 2] = 0.0
            sample.cond_masks = cm
        return sample

    def task_labels(self, task: Task) -> list[tuple[str, str, str]]:
        """The (scene, spa, tem) row labels load_sample would produce for
        ``task`` — WITHOUT any file IO. Multi-host wave execution needs
        every task's grid cells on every process, but only the owning
        process loads the frames."""
        from diffuman4d_tpu.data.cameras import nearest_input_camera

        scene = self.dataset.scene_label
        if task.domain == "spatial":
            return [(scene, spa, task.domain_label) for spa in self.spa_labels]
        cameras = self.dataset.cameras[scene]
        target_pose = cameras[task.domain_label].pose
        input_poses = [cameras[s].pose for s in self.input_spa_labels]
        cond_spa = self.input_spa_labels[
            nearest_input_camera(target_pose, input_poses)
        ]
        return [
            (scene, spa, tem)
            for spa in (cond_spa, task.domain_label)
            for tem in self.tem_labels
        ]

    def _windows_for(self, task: Task, n_rows: int) -> np.ndarray:
        cfg = self.pipeline.sliding
        if task.domain == "spatial":
            targets = np.asarray(
                [i for i, s in enumerate(self.spa_labels) if s not in self.input_spa_labels]
            )
            inputs = np.asarray(
                [i for i, s in enumerate(self.spa_labels) if s in self.input_spa_labels]
            )
        else:
            half = n_rows // 2
            inputs = np.arange(half)
            targets = np.arange(half, n_rows)
        return build_windows(
            targets,
            inputs,
            task.domain,
            cfg.window_size,
            cfg.sliding_stride,
            cfg.sliding_shift,
            cfg.bidirectional,
        )

    # ------------------------------------------------------------------
    def execute_one_task(
        self,
        task: Task,
        key,
        sample: Sample | None = None,
        save_async: bool = False,
    ) -> None:
        if sample is None:
            sample = self.load_sample(task)
        spa, tem = self._grid_cells(sample.labels)
        cond = self.pipeline.prepare_conditions(sample, key)

        latents = self.grid_latents[spa, tem]
        t_idx = self.grid_t_idx[spa, tem]
        windows = self._windows_for(task, len(sample.labels))
        import jax

        aux = (
            jax.tree.map(lambda a: a[spa, tem], self.grid_aux)
            if self.grid_aux is not None else None
        )

        latents, t_idx, aux = self.pipeline.sliding_denoise(
            cond, latents, t_idx, windows, task.domain, aux=aux
        )

        # write back to the grid
        self.grid_latents = self.grid_latents.at[spa, tem].set(latents)
        self.grid_t_idx[spa, tem] = np.asarray(t_idx)
        if self.grid_aux is not None:
            self.grid_aux = jax.tree.map(
                lambda g, u: g.at[spa, tem].set(u), self.grid_aux, aux
            )
        if self._host_mirror is not None:
            upd = {"latents": latents}
            if aux is not None:
                upd.update({f"aux_{k}": v for k, v in aux.items()})
            self._mirror_update(spa, tem, upd)

        t_np = np.asarray(t_idx)  # blocks on the task's denoise chain
        if save_async and self._saver is not None:
            # decode + jpeg-save on the saver thread so the host-side
            # output work (~5-10 s/task at 48x1024^2) overlaps the NEXT
            # task's denoise; the decode compute simply queues on the
            # device stream ahead of it. Joined via _flush_saves() before
            # any checkpoint/validation (resume correctness: grid_state
            # must never claim a task whose outputs aren't on disk).
            self._save_futs.append(
                self._saver.submit(
                    self._save_task_outputs, task, sample, latents, t_np
                )
            )
        else:
            self._save_task_outputs(task, sample, latents, t_np)

    def _flush_saves(self) -> None:
        """Join pending async saves, re-raising the first failure."""
        futs, self._save_futs = self._save_futs, []
        for f in futs:
            f.result()

    def _save_task_outputs(self, task, sample, latents, t_idx) -> None:
        total = self.pipeline.sliding.total_steps
        done = t_idx == total
        if done.any():
            rows = np.nonzero(done)[0]
            images = self.pipeline.decode(latents[jnp.asarray(rows)])
            save_final_images(
                images,
                [sample.labels[i] for i in rows],
                [sample.crops[i] for i in rows],
                self.output_dir,
            )
            self._saved_cells.update(sample.labels[i][1:3] for i in rows)
        # input rows are written as their (composited) GT pixels — the
        # reference replaces output rows with inputs before saving
        # (sampling_utils.py:96-107); skip_exists makes repeats free
        inp = np.nonzero(sample.cond_masks == 0.0)[0]
        if inp.size:
            save_final_images(
                sample.pixel_values[inp] * 0.5 + 0.5,
                [sample.labels[i] for i in inp],
                [sample.crops[i] for i in inp],
                self.output_dir,
            )
            self._saved_cells.update(sample.labels[i][1:3] for i in inp)
        if self.save_debug_grids:
            # grid rows mirror sampling_utils.py:70-93: blended skeletons,
            # inputs, outputs (input rows dimmed), L1 error
            # decode() returns uint8; grid math runs in float
            images = self.pipeline.decode(latents).astype(np.float32) / 255.0
            inputs01 = sample.pixel_values * 0.5 + 0.5
            sk01 = (
                sample.skeletons.astype(np.float32) / 255.0
                if sample.skeletons.dtype == np.uint8
                else sample.skeletons * 0.5 + 0.5
            )
            skel01 = sk01 * 0.8 + inputs01 * 0.2
            error = np.clip(np.abs(images - inputs01), 0.0, 1.0)
            outputs = images.copy()
            inp_rows = sample.cond_masks == 0.0
            outputs[inp_rows] *= 0.2
            rows = {
                "skeleton": skel01,
                "input": inputs01,
                "output": outputs,
                "error": error,
            }
            tag = "spa" if task.domain == "temporal" else "tem"
            save_debug_grid(
                rows, self.output_dir, f"alt{task.alt}_{tag}{task.domain_label}"
            )
        if self.save_crop_params:
            from diffuman4d_tpu.sampling.outputs import save_json
            import os.path as osp

            for (_, spa, tem), crop in zip(sample.labels, sample.crops):
                save_json(crop, osp.join(self.output_dir, "crops", spa, f"{tem}.json"))

    # ------------------------------------------------------------------
    @staticmethod
    def _process_barrier(name: str, timeout_ms: int = 1_200_000) -> None:
        """Align all processes on the coordination service (plain gRPC —
        no per-collective rendezvous window). Used to bound the skew with
        which processes enter a gloo/collective context creation."""
        try:
            from jax._src import distributed as _dist

            client = _dist.global_state.client
            if client is not None:
                client.wait_at_barrier(name, timeout_ms)
        except Exception:
            log.warning("process barrier %s unavailable; continuing", name)

    @staticmethod
    def _local_wave_rows(arr) -> dict[int, np.ndarray]:
        """Map wave-row index -> host copy of that row, from this process's
        addressable shards of a data-sharded wave array (multi-host: a
        process can only touch the rows it feeds)."""
        rows: dict[int, np.ndarray] = {}
        for sh in arr.addressable_shards:
            r0 = sh.index[0].start or 0
            data = np.asarray(sh.data)
            for rr in range(data.shape[0]):
                rows[r0 + rr] = data[rr]
        return rows

    def _task_key(self, round_idx: int, task_idx: int):
        """Deterministic per-(round, task) key: execution order, wave
        padding, and resume cannot change the noise schedule."""
        import jax

        base = jax.random.PRNGKey(self.seed + 1)
        return jax.random.fold_in(jax.random.fold_in(base, round_idx), task_idx)

    def _prepare_wave(self, round_idx, tasks, i, n_wave, my_rows=None):
        """Host-side wave prep: sample loading (file IO) + condition encode.
        Returns (padded tasks, samples, conds, cells). Called *between* the
        previous wave's async denoise dispatch and its blocking output save,
        so this CPU work overlaps device compute (double-buffering).

        ``my_rows`` (multi-host): the wave slots whose data-mesh rows this
        process hosts. Other slots get grid cells only (from task_labels,
        no IO) with ``samples/conds`` left as None — their frames are
        loaded and encoded by the owning process."""
        from diffuman4d_tpu.utils.tracing import phase

        wave = tasks[i : i + n_wave]
        padded = wave + [wave[-1]] * (n_wave - len(wave))
        samples, conds, cells = [], [], []
        prev_idx = None
        for j, task in enumerate(padded):
            # clamped key => padded duplicates compute bit-identical results,
            # making their grid scatter idempotent
            idx = min(i + j, len(tasks) - 1)
            if my_rows is not None and j not in my_rows:
                samples.append(None)
                conds.append(None)
                cells.append(self._grid_cells(self.task_labels(task)))
                prev_idx = None  # reuse must not cross an unloaded slot
                continue
            if idx == prev_idx:
                # padded duplicate of the previous task: reuse its sample
                # and conditions instead of re-reading/re-encoding
                samples.append(samples[-1])
                conds.append(conds[-1])
                cells.append(cells[-1])
                continue
            prev_idx = idx
            sub = self._task_key(round_idx, idx)
            # sync=False: these run inside the denoise-overlap window —
            # a device sync here would serialize the double-buffering
            with phase("wave/load_sample", sync=False):
                s = self.load_sample(task)
            samples.append(s)
            with phase("wave/prepare_conditions", sync=False):
                # stacked_skel: wave conds are tree-stacked across tasks,
                # so the skeleton source must be one array leaf per task
                conds.append(
                    self.pipeline.prepare_conditions(s, sub, stacked_skel=True)
                )
            cells.append(self._grid_cells(s.labels))
        return padded, samples, conds, cells

    def execute_tasks_parallel(self, mesh, key=None) -> None:
        """SPMD execution: waves of ``data``-axis-many tasks per pjit call.

        Tasks within a round are independent (SURVEY §2.4), so each device
        denoises its own task; the round boundary is the wave loop. Replaces
        the reference's thread-per-GPU queues + CPU latent bounce
        (sampling_runner.py:26-43, sliding_iterative_sampler.py:181-185).

        Latents never touch the host inside a round: the grid lives on the
        mesh, wave cells are gathered/scattered with device-side advanced
        indexing, and the only device->host transfers are the small int32
        timestep indices plus decoded output images. Host prep for wave N+1
        runs while wave N denoises (JAX dispatch is async).

        Multi-host (TPU pod): each process prepares and saves only the
        tasks whose data-mesh rows it hosts; wave conditions are assembled
        from per-process local shards (parallel.distributed.put_sharded),
        grid gather/scatter runs under jit against the global mesh, and
        the small timestep-index grid is kept host-replicated via an
        on-device all-gather. Replaces the reference's one-machine
        multi-GPU runner (sampling_runner.py:26-43)."""
        from concurrent.futures import ThreadPoolExecutor

        # decode+jpeg of finished cells runs on a saver thread so round-3
        # output writes overlap the next wave's denoise (same contract as
        # the single-device path: flushed before any checkpoint)
        self._saver = ThreadPoolExecutor(max_workers=1)
        try:
            self._execute_waves(mesh, key)
            self._flush_saves()
        finally:
            self._saver.shutdown(wait=True)
            self._saver = None

    def _execute_waves(self, mesh, key=None) -> None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from diffuman4d_tpu.parallel.distributed import (
            host_local_to_global,
            local_data_rows,
            put_sharded,
        )

        n_wave = mesh.shape["data"]
        multi = jax.process_count() > 1
        self._exec_t0 = time.perf_counter()
        if multi and self.time_budget_s is not None:
            raise ValueError(
                "time_budget_s is single-process only (a clock-based stop "
                "branch is not deterministic across hosts); size multi-host "
                "sessions with task_budget instead"
            )
        my_rows = set(local_data_rows(mesh)) if multi else None
        if multi:
            # the denoise jit mixes params with global arrays; params must
            # live on the global mesh (single-process jits auto-replicate)
            self.pipeline.commit_mesh_params(mesh)
        rep = NamedSharding(mesh, P())
        shard_d = NamedSharding(mesh, P("data"))
        self.grid_latents = put_sharded(mesh, P(), self.grid_latents)
        if self.grid_aux is not None:
            self.grid_aux = jax.tree.map(
                lambda g: put_sharded(mesh, P(), g), self.grid_aux
            )
        gather_j = jax.jit(lambda g, s, t: jax.tree.map(lambda a: a[s, t], g),
                           out_shardings=shard_d)
        scatter_j = jax.jit(
            lambda g, s, t, v: jax.tree.map(
                lambda a, u: a.at[s, t].set(u.astype(a.dtype)), g, v
            ),
            out_shardings=rep, donate_argnums=0,
        )
        allrep_j = jax.jit(lambda x: x, out_shardings=rep)
        if multi:
            # Establish the collective communicator cliques NOW, while all
            # processes are still in lockstep. Later programs compile for
            # minutes and processes drift apart; a communicator context
            # initialized under that skew can exceed the backend's fixed
            # ~30 s rendezvous window (observed with CPU gloo). Warming the
            # data->replicated all-gather cliques (the only collectives the
            # wave loop uses) on a tiny array makes every later collective
            # reuse an existing context.
            # Even reaching THIS point can skew >30 s across processes
            # (compile-cache racing); align first on a coordination-service
            # barrier — pure gRPC, no gloo rendezvous window.
            self._process_barrier("d4d:pre_warmup")
            warm = put_sharded(
                mesh, P("data"), np.zeros((n_wave, 1), np.float32)
            )
            np.asarray(allrep_j(warm).addressable_data(0))
            # the end-of-run coverage union uses a different communicator
            # (process_allgather); establish it here too — after the final
            # wave, processes are skewed by their unequal output-save work
            # and a fresh rendezvous can exceed the ~30 s window
            from jax.experimental import multihost_utils

            cov_shape = (len(self.spa_labels), len(self.tem_labels))
            multihost_utils.process_allgather(np.zeros(cov_shape, bool))

        def _stack_conds(conds):
            if not multi:
                return jax.tree.map(lambda *xs: jnp.stack(xs), *conds)
            # host bounce: local conds -> numpy -> global data-sharded,
            # feeding ONLY this process's rows (host_local_to_global; a
            # zero-copy device path exists via
            # make_array_from_single_device_arrays — the bounce is small
            # next to denoise time and keeps the code uniform).
            local = [conds[j] for j in sorted(my_rows)]
            stacked = jax.tree.map(
                lambda *xs: fast_stack([np.asarray(x) for x in xs]), *local
            )
            return host_local_to_global(mesh, P("data"), stacked)

        for round_idx, tasks in enumerate(self.all_tasks):
            if round_idx < self._completed_rounds:
                continue
            # intra-round resume: the first `_resume_tasks_done` tasks of
            # this round are already in the restored grid (disjoint cells,
            # deterministic per-(round, task) keys — a prefix count is a
            # complete description). Consumed once.
            start = self._resume_tasks_done
            self._resume_tasks_done = 0
            wave_starts = list(range(start, len(tasks), n_wave))
            if wave_starts:
                prep = self._prepare_wave(
                    round_idx, tasks, wave_starts[0], n_wave, my_rows
                )
            from diffuman4d_tpu.utils.tracing import phase

            for w_num, i in enumerate(wave_starts):
                padded, samples, conds, cells = prep
                n_real = min(n_wave, len(tasks) - i)

                with phase("wave/stack_conds", sync=False):
                    cond_b = _stack_conds(conds)
                with phase("wave/gather", sync=False):
                    spa_b = np.stack([s for s, _ in cells])
                    tem_b = np.stack([t for _, t in cells])
                    lat_b = gather_j(self.grid_latents, spa_b, tem_b)
                    ti_b = np.stack(
                        [self.grid_t_idx[s, t] for s, t in cells]
                    )
                windows = self._windows_for(padded[0], cells[0][0].shape[0])

                # schedule invariants per task (pipeline_diffuman4d.py:480-487)
                for k in range(n_real):
                    if samples[k] is None:
                        continue  # owned (and checked) by another process
                    ic = np.asarray(samples[k].cond_masks == 0.0)
                    tgt = ti_b[k][~ic]
                    if (tgt != tgt[0]).any() or (ti_b[k][ic] != 0).any():
                        raise ValueError(
                            f"schedule invariant violated for task {padded[k]}"
                        )

                aux_in = None
                if self.grid_aux is not None:
                    aux_in = gather_j(self.grid_aux, spa_b, tem_b)
                # async dispatch — host continues while devices denoise
                with phase("wave/dispatch", sync=False):
                    lat_b, ti_b_new, aux_b = self.pipeline.sliding_denoise_batch(
                        cond_b, lat_b, ti_b, windows, padded[0].domain,
                        aux_b=aux_in, mesh=mesh,
                    )
                # device-side scatter (duplicate padded cells write identical
                # values, so the scatter is well-defined)
                with phase("wave/scatter", sync=False):
                    self.grid_latents = scatter_j(
                        self.grid_latents, spa_b, tem_b, lat_b
                    )
                    if self.grid_aux is not None:
                        self.grid_aux = scatter_j(
                            self.grid_aux, spa_b, tem_b, aux_b
                        )
                # stage the wave's cells for the host mirror: bitcast now,
                # start the (relay-slow, ~18 MB/s) D2H behind the denoise
                mirror_stage = None
                if self._host_mirror is not None and not multi:
                    mirror_stage = {
                        "latents": jax.lax.bitcast_convert_type(
                            lat_b, jnp.uint16
                        ) if lat_b.dtype == jnp.bfloat16 else lat_b
                    }
                    if self.grid_aux is not None:
                        for k2, v2 in aux_b.items():
                            mirror_stage[f"aux_{k2}"] = (
                                jax.lax.bitcast_convert_type(v2, jnp.uint16)
                                if v2.dtype == jnp.bfloat16 else v2
                            )
                    for v2 in mirror_stage.values():
                        try:
                            v2.copy_to_host_async()
                        except Exception:  # noqa: BLE001 — relay may decline
                            pass

                # overlap: prep the NEXT wave's host work before blocking on
                # this wave's results
                if w_num + 1 < len(wave_starts):
                    prep = self._prepare_wave(
                        round_idx, tasks, wave_starts[w_num + 1], n_wave, my_rows
                    )

                t_wave = time.perf_counter()
                with phase("wave/denoise_block", sync=False):
                    # blocks until the wave's denoise has finished; the
                    # device all-gather keeps grid_t_idx host-replicated
                    ti_host = np.asarray(
                        allrep_j(ti_b_new).addressable_data(0)
                    )
                lat_local = self._local_wave_rows(lat_b) if multi else None
                if mirror_stage is not None:
                    with phase("wave/mirror", sync=False):
                        host_vals = {
                            n: np.asarray(v) for n, v in mirror_stage.items()
                        }
                        for k in range(n_real):
                            s_idx, t_cells = cells[k]
                            for n, v in host_vals.items():
                                self._host_mirror[n][s_idx, t_cells] = v[k]
                for k in range(n_real):
                    s_idx, t_idx_cells = cells[k]
                    self.grid_t_idx[s_idx, t_idx_cells] = ti_host[k]
                    if samples[k] is None:
                        continue  # saved by the owning process
                    with phase("wave/save_outputs", sync=False):
                        # saver thread: decode+jpeg overlap the next wave
                        self._save_futs.append(
                            self._saver.submit(
                                self._save_task_outputs,
                                padded[k], samples[k],
                                lat_b[k] if lat_local is None else lat_local[k],
                                ti_host[k],
                            )
                        )
                log.info(
                    "round %d/%d (%s): tasks %d-%d/%d done (wave sync+save "
                    "%.1fs)",
                    round_idx + 1, len(self.all_tasks), padded[0].domain,
                    i + 1, i + n_real, len(tasks),
                    time.perf_counter() - t_wave,
                )
                # intra-round checkpoint every ~checkpoint_every_tasks
                # tasks (wave-count cadence: deterministic across hosts)
                done = i + n_real
                self._tasks_run += n_real
                budget_out = self._budget_out()
                if (
                    self.checkpoint_rounds
                    and self.checkpoint_every_tasks > 0
                    and done < len(tasks)
                    and (
                        budget_out
                        or (w_num + 1)
                        % max(1, -(-self.checkpoint_every_tasks // n_wave))
                        == 0
                    )
                ):
                    with phase("wave/save_state", sync=False):
                        # outputs must be on disk before the state claims
                        # their tasks (resume correctness)
                        self._flush_saves()
                        self.save_state(tasks_done=done)
                if budget_out and done < len(tasks):
                    log.info(
                        "budget (tasks=%s, time=%ss) reached at round %d "
                        "task %d/%d — state saved, stopping for resume",
                        self.task_budget, self.time_budget_s,
                        round_idx + 1, done, len(tasks),
                    )
                    return
            self._flush_saves()
            self._completed_rounds = round_idx + 1
            self.validate_grid(self._completed_rounds)
            if self.checkpoint_rounds:
                self.save_state()
            # domain switch: drop the finished round's device condition
            # caches. The next domain's first program is the HBM peak (the
            # temporal wave is CFG batch 48 vs spatial 32) and ~1.3 GB of
            # stale spatial entries pushed it over the single-chip fit
            # (r5 chain session 5: RESOURCE_EXHAUSTED at the first temporal
            # dispatch; a fresh process with empty caches fits).
            nxt = round_idx + 1
            if (
                nxt < len(self.all_tasks)
                and self.all_tasks[nxt]
                and tasks
                and self.all_tasks[nxt][0].domain != tasks[0].domain
            ):
                self.pipeline.clear_condition_caches()
            if self._budget_out() and round_idx + 1 < len(self.all_tasks):
                log.info(
                    "budget (tasks=%s, time=%ss) reached at round %d "
                    "boundary — stopping for resume",
                    self.task_budget, self.time_budget_s, round_idx + 1,
                )
                return
        if multi:
            # Each process saved only its own tasks' outputs, and processes
            # finish their last wave at different times — a lone file count
            # here races the other processes' writes (and sees nothing on
            # non-shared filesystems). Union the per-process coverage sets
            # with an allgather (which doubles as the barrier the reference
            # gets from joining its worker threads, sampling_runner.py:53-60),
            # then let process 0 run the file-level check against the — by
            # then quiescent — shared output dir.
            from jax.experimental import multihost_utils

            # bound the save-skew before the gather's collective context
            self._process_barrier("d4d:pre_coverage_check")
            cov = np.zeros(
                (len(self.spa_labels), len(self.tem_labels)), bool
            )
            for s, t in self._saved_cells:
                cov[self._spa_index[s], self._tem_index[t]] = True
            # a resumed run saved cells in a previous life: count files
            # already on disk as covered (they are what the check is about)
            import os
            import os.path as osp

            for s, si in self._spa_index.items():
                d = osp.join(self.output_dir, "images", s)
                if osp.isdir(d):
                    for f in os.listdir(d):
                        ti = self._tem_index.get(f[:-4])
                        if f.endswith(".jpg") and ti is not None:
                            cov[si, ti] = True
            cov_all = np.asarray(multihost_utils.process_allgather(cov))
            if cov_all.ndim == 2:  # tiled gather fallback
                cov_all = cov_all[None]
            if not cov_all.any(axis=0).all():
                missing = int((~cov_all.any(axis=0)).sum())
                raise ValueError(
                    f"Sampling failed: {missing} grid cells saved by no process."
                )
            if jax.process_index() == 0 and not check_sampling_results(
                self.spa_labels, self.tem_labels, self.output_dir
            ):
                raise ValueError("Sampling failed: output grid incomplete.")
        elif not check_sampling_results(
            self.spa_labels, self.tem_labels, self.output_dir
        ):
            raise ValueError("Sampling failed: output grid incomplete.")

    def execute_tasks(self, key=None) -> None:
        """All rounds, sequentially (single-device path;
        sliding_iterative_sampler.py:206-212).

        The next task's sample loads on an IO thread while the current
        task's denoise runs on the device (dispatch is async; the host
        spends most of each task blocked on device results) — the
        single-chip counterpart of the wave executor's prepare overlap.
        Samples do not depend on grid state, so prefetching across round
        boundaries is exact."""
        from concurrent.futures import ThreadPoolExecutor

        self._exec_t0 = time.perf_counter()
        todo: list[tuple[int, int, Task]] = []
        for round_idx, tasks in enumerate(self.all_tasks):
            if round_idx < self._completed_rounds:
                continue
            start = self._resume_tasks_done
            self._resume_tasks_done = 0
            todo.extend(
                (round_idx, task_idx, task)
                for task_idx, task in enumerate(tasks)
                if task_idx >= start
            )

        prefetch = ThreadPoolExecutor(max_workers=1)
        self._saver = ThreadPoolExecutor(max_workers=1)
        fut = None
        try:
            for j, (round_idx, task_idx, task) in enumerate(todo):
                sample = fut.result() if fut is not None else None
                fut = (
                    prefetch.submit(self.load_sample, todo[j + 1][2])
                    if j + 1 < len(todo) else None
                )
                self.execute_one_task(
                    task, self._task_key(round_idx, task_idx), sample=sample,
                    save_async=True,
                )
                done = task_idx + 1
                self._tasks_run += 1
                budget_out = self._budget_out()
                if done == len(self.all_tasks[round_idx]):
                    self._flush_saves()
                    self._completed_rounds = round_idx + 1
                    self.validate_grid(self._completed_rounds)
                    if self.checkpoint_rounds:
                        self.save_state()
                    # domain switch: free the finished round's device
                    # condition caches before the next domain's HBM peak
                    # (see _execute_waves round boundary for the OOM record)
                    if (
                        round_idx + 1 < len(self.all_tasks)
                        and self.all_tasks[round_idx + 1]
                        and self.all_tasks[round_idx + 1][0].domain
                        != task.domain
                    ):
                        self.pipeline.clear_condition_caches()
                elif (
                    self.checkpoint_rounds
                    and self.checkpoint_every_tasks > 0
                    and (budget_out or done % self.checkpoint_every_tasks == 0)
                ):
                    self._flush_saves()
                    self.save_state(tasks_done=done)
                if budget_out and (round_idx, done) != (
                    len(self.all_tasks) - 1, len(self.all_tasks[-1])
                ):
                    log.info(
                        "budget (tasks=%s, time=%ss) reached at round %d "
                        "task %d/%d — state saved, stopping for resume",
                        self.task_budget, self.time_budget_s,
                        round_idx + 1, done,
                        len(self.all_tasks[round_idx]),
                    )
                    return
            self._flush_saves()
        finally:
            prefetch.shutdown(wait=False, cancel_futures=True)
            self._saver.shutdown(wait=True)
            self._saver = None
        if not check_sampling_results(self.spa_labels, self.tem_labels, self.output_dir):
            raise ValueError("Sampling failed: output grid incomplete.")
