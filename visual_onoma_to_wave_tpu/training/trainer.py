"""Training orchestrator: the `04_train.py` equivalent.

Reproduces the reference loop semantics (reference scripts/04_train.py:115-175):
  * periodic scalar logging (log_step), validation (val_step), sample
    synthesis (synth_step), checkpointing (save_step), stop at total_step;
  * length-weighted validation losses over the full val split
    (reference scripts/evaluate.py:17-105);
  * resume from checkpoint restores params + optimizer state + schedule
    position (reference --restore_step).

TPU-native: one jit train step, batches sharded over the `data` mesh axis,
device-side grad all-reduce by XLA; throughput (mel-frames/sec) tracked per
step — the observability the reference lacks.
"""
from __future__ import annotations

import pathlib
from typing import Callable, Optional

import jax
import numpy as np

from visual_onoma_to_wave_tpu.config import Config, DatasetMetadata
from visual_onoma_to_wave_tpu.data.dataset import OnomaDataset
from visual_onoma_to_wave_tpu.models import VTTS
from visual_onoma_to_wave_tpu.parallel import (
    barrier,
    get_mesh,
    host_tree,
    is_primary,
    replicate,
    shard_batch,
    shard_batch_multiprocess,
)
from visual_onoma_to_wave_tpu.training.schedule import make_optimizer
from visual_onoma_to_wave_tpu.training.train_state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_synth_step,
    make_train_step,
)
from visual_onoma_to_wave_tpu.utils.checkpoint import CheckpointManager
from visual_onoma_to_wave_tpu.utils.logging import MetricsLogger, StepTimer

LOSS_KEYS = ("total_loss", "mel_loss", "postnet_mel_loss", "energy_loss",
             "kurtosis_loss", "duration_loss")


def _jit_batch(batch: dict) -> dict:
    return {k: v for k, v in batch.items() if k not in ("names", "mel_lens")}


class Trainer:
    def __init__(self, config: Config, restore_step: Optional[int] = None,
                 vocoder_params=None, use_mesh: bool = True,
                 profile_dir: Optional[str] = None,
                 profile_steps: tuple[int, int] = (10, 15),
                 loader_workers: Optional[int] = None):
        self.config = config
        self.loader_workers = loader_workers
        from visual_onoma_to_wave_tpu.utils.compile_cache import (
            enable_persistent_cache)
        enable_persistent_cache()
        self.metadata = DatasetMetadata.load(config.path.preprocessed)
        self.train_ds = OnomaDataset("train.txt", config, sort=True,
                                     drop_last=True, metadata=self.metadata)
        self.val_ds = OnomaDataset("val.txt", config, sort=False,
                                   drop_last=False, metadata=self.metadata)
        self.model = VTTS.from_config(config, self.metadata,
                                      n_vocab=self.train_ds.n_vocab)
        opt = config.train.optimizer
        self.tx = make_optimizer(
            init_lr=opt.init_lr, warmup_steps=opt.warm_up_step,
            anneal_steps=opt.anneal_steps, anneal_rate=opt.anneal_rate,
            betas=opt.betas, eps=opt.eps, weight_decay=opt.weight_decay,
            grad_clip=opt.grad_clip_thresh, grad_acc_steps=opt.grad_acc_step,
        )
        self.use_image = config.train.use_image
        self.train_step = make_train_step(self.model, self.tx, self.use_image)
        self.eval_step = make_eval_step(self.model, self.use_image)
        self.synth_step = make_synth_step(self.model, self.use_image)

        sample = _jit_batch(next(self.train_ds.batches(shuffle=False)))
        self.state = create_train_state(
            self.model, self.tx, jax.random.PRNGKey(config.train.seed),
            sample, self.use_image)

        # multi-host: jax.devices() is the GLOBAL device set after
        # parallel.init_distributed, so the same 1-D data mesh spans every
        # process (reference ceiling: single-process DataParallel,
        # 04_train.py:75)
        self.n_proc = jax.process_count()
        if self.n_proc > 1 and not use_mesh:
            raise ValueError(
                "multi-process training requires the data mesh "
                "(use_mesh=True)")
        if self.n_proc > 1 and config.train.data_parallel_devices:
            raise ValueError(
                "train.data_parallel_devices must be 0 (= all devices) "
                "under multi-process training: every process's chips "
                "belong to the global mesh")
        self.mesh = get_mesh(config.train.data_parallel_devices) if use_mesh else None
        if self.mesh is not None and self.mesh.size > 1:
            bs = config.train.optimizer.batch_size
            if self.n_proc > 1 and bs % self.mesh.size != 0:
                raise ValueError(
                    f"train.optimizer.batch_size={bs} must be a multiple of "
                    f"the global device count {self.mesh.size} "
                    f"({self.n_proc} processes) for multi-process training")
            if bs % self.mesh.size != 0:
                # a mis-sized config must not silently train single-device:
                # shrink the mesh to the largest device count dividing the
                # batch and say so (reference DataParallel scattered whatever
                # fit, 04_train.py:75)
                import math
                import warnings
                n = math.gcd(bs, self.mesh.size)
                warnings.warn(
                    f"train.optimizer.batch_size={bs} is not divisible by "
                    f"the {self.mesh.size}-device data mesh; using "
                    f"{n} device(s). Set batch_size to a multiple of the "
                    f"device count for full utilization.")
                self.mesh = get_mesh(n) if n > 1 else None
        self.ckpt = CheckpointManager(config.path.ckpt)
        # stamp the vocabulary next to the checkpoints: a checkpoint dir is
        # then self-describing for serving (Synthesizer.from_checkpoint).
        # Primary-only under multi-host: the ckpt dir is shared storage.
        from visual_onoma_to_wave_tpu.data.symbols import save_symbol_map
        if is_primary():
            save_symbol_map(self.ckpt.dir, self.train_ds.symbol_map)
        if restore_step == -1:  # -1 = latest available (extension over reference)
            restore_step = self.ckpt.latest_step()
        if restore_step is not None:
            # multi-process: restore onto a host-numpy template (every
            # process reads the shared ckpt), then replicate below
            template = (jax.device_get(self.state) if self.n_proc > 1
                        else self.state)
            self.state = self.ckpt.restore(template, restore_step)
        if self.n_proc > 1:
            # identical per-process inits/restores -> one global replicated
            # train state over the full mesh
            self.state = replicate(jax.device_get(self.state), self.mesh)
        if is_primary():
            self.train_log = MetricsLogger(config.path.log, "train")
            self.val_log = MetricsLogger(config.path.log, "val")
        else:
            from visual_onoma_to_wave_tpu.utils.logging import NullLogger
            self.train_log = NullLogger()
            self.val_log = NullLogger()
        self.result_dir = pathlib.Path(config.path.result)
        (self.result_dir / "Val").mkdir(parents=True, exist_ok=True)
        self.vocoder_params = vocoder_params
        self.timer = StepTimer()
        self._rng = jax.random.PRNGKey(config.train.seed + 1)
        if self.n_proc > 1:
            # jit inputs must all be global arrays in multi-process mode
            self._rng = replicate(np.asarray(self._rng), self.mesh)
        # jax.profiler trace over a step window (observability the reference
        # lacks, SURVEY.md §5): view with tensorboard/xprof or Perfetto.
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self._profiling = False
        self._warned_unsharded = False

    # ------------------------------------------------------------------
    def _place(self, batch: dict, strict: bool = False,
               local: bool = False) -> dict:
        """Shard the batch over the data mesh. A batch not divisible by the
        mesh size cannot be sharded: hard error for training batches
        (strict=True — a mis-sized config must not silently train
        single-device), one warning then single-device for ragged eval
        tails."""
        if self.mesh is None or self.mesh.size <= 1:
            return batch
        bs = batch["texts"].shape[0]
        if self.n_proc > 1:
            if local:
                # partitioned-loader path: `batch` holds only this
                # process's rows, padded to the plan's global shapes
                return shard_batch_multiprocess(batch, self.mesh,
                                                already_local=True)
            if bs % self.mesh.size == 0:
                # each process feeds only its own row slice to its chips
                return shard_batch_multiprocess(batch, self.mesh)
            if strict:
                raise ValueError(
                    f"training batch size {bs} is not divisible by the "
                    f"global device count {self.mesh.size}")
            # ragged eval tail: replicate — every device computes the small
            # batch redundantly (a few rows), values exactly as if it ran
            # on one device; cheaper and simpler than re-sharding
            return replicate(batch, self.mesh)
        if bs % self.mesh.size == 0:
            return shard_batch(batch, self.mesh)
        if strict:
            raise ValueError(
                f"training batch size {bs} is not divisible by the data-mesh "
                f"size {self.mesh.size}; set train.optimizer.batch_size to a "
                f"multiple of data_parallel_devices")
        if not self._warned_unsharded:
            self._warned_unsharded = True
            msg = (f"batch size {bs} not divisible by mesh size "
                   f"{self.mesh.size}; running this batch on a single device")
            import warnings
            warnings.warn(msg)
            self.train_log.text(f"WARNING: {msg}")
        return batch

    def n_params(self) -> int:
        return int(sum(np.prod(p.shape) for p in jax.tree.leaves(self.state.params)))

    # ------------------------------------------------------------------
    def train(self, max_steps: Optional[int] = None,
              on_step: Optional[Callable] = None) -> TrainState:
        cfg = self.config.train
        total = max_steps if max_steps is not None else cfg.step.total_step
        step = int(self.state.step)
        epoch = 0
        mesh_info = (f"{self.mesh.size}-device data mesh "
                     f"({self.mesh.devices.flat[0].platform})"
                     if self.mesh is not None else "single device (no mesh)")
        if step >= total:
            # resuming a finished run: no pool spawn, no probe, no-op fast
            print(f"training: already at step {step} >= {total}, nothing "
                  f"to do")
            self.ckpt.save(self.state)
            barrier("final_ckpt")
            return self.state
        from visual_onoma_to_wave_tpu.data.loader import ProcessLoader
        loader = ProcessLoader(self.train_ds, "train.txt",
                               num_workers=self.loader_workers)
        print(f"training: {self.n_params()/1e6:.2f}M params, "
              f"{len(self.train_ds)} clips, target {total} steps, "
              f"{mesh_info}, loader backend {loader.backend}"
              + (f" x{loader.num_workers}" if loader.backend == "process"
                 else ""))
        try:
            self._train_loop(loader, total, step, epoch, cfg, on_step)
        finally:
            loader.close()
        self._stop_profile()
        self.ckpt.save(self.state)
        # keep fast processes alive until the shared-dir write completes
        barrier("final_ckpt")
        return self.state

    def _train_loop(self, loader, total, step, epoch, cfg, on_step) -> None:
        # multi-host: the epoch is planned globally from the shared seed,
        # but each host loads ONLY its own row slice of every batch (pad
        # shapes come from metadata, so all hosts agree) — host-side work
        # scales 1/P instead of being replicated P times
        local = self.n_proc > 1
        local_slice = ((jax.process_index(), self.n_proc)
                       if local else None)
        while step < total:
            epoch += 1
            for batch in loader.epoch(
                    group_size=4, seed=self.config.train.seed + epoch,
                    local_slice=local_slice):
                jb = self._place(_jit_batch(batch), strict=True, local=local)
                self._maybe_profile(step)
                self.timer.start()
                self.state, losses = self.train_step(self.state, jb, self._rng)
                step = int(self.state.step)
                if step % cfg.step.log_step == 0:
                    # materialize after async dispatch. Under the
                    # partitioned loader the local mel_lens cover 1/P
                    # of the global batch: scale for a global
                    # frames/sec estimate (hosts' slices differ
                    # slightly in length, so it is approximate)
                    losses = {k: float(v) for k, v in losses.items()}
                    self.timer.stop(int(np.sum(batch["mel_lens"]))
                                * (self.n_proc if local else 1))
                    losses["frames_per_sec"] = self.timer.frames_per_sec
                    self.train_log.scalars(step, losses)
                    self.train_log.text(
                        f"step {step} epoch {epoch} total {losses['total_loss']:.4f} "
                        f"mel {losses['mel_loss']:.4f} fps {losses['frames_per_sec']:.0f}")
                else:
                    self.timer.stop(int(np.sum(batch["mel_lens"]))
                                * (self.n_proc if local else 1))
                if step % cfg.step.val_step == 0:
                    val_losses = self.evaluate(
                        step, metrics=cfg.step.val_metrics)
                    self.val_log.scalars(step, val_losses)
                if step % cfg.step.synth_step == 0:
                    self._synth_sample(step)
                if step % cfg.step.save_step == 0:
                    self.ckpt.save(self.state)
                if on_step is not None:
                    on_step(step, losses if isinstance(losses, dict) else None)
                if step >= total:
                    break

    def _maybe_profile(self, step: int) -> None:
        if self.profile_dir is None:
            return
        lo, hi = self.profile_steps
        if not self._profiling and step == lo:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
        elif self._profiling and step >= hi:
            self._stop_profile()

    def _stop_profile(self) -> None:
        if self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            self.train_log.text(
                f"profiler trace written to {self.profile_dir}")

    # ------------------------------------------------------------------
    def evaluate(self, step: int | None = None, metrics: bool = False) -> dict:
        """Length-weighted mean losses over the full val split.

        metrics=True adds objective quality numbers the reference never had
        (its evaluate.py:58-103 only logs audio for human listening):
        teacher-forced mel_l1 + mcd (dB) and free-running mcd_dtw (dB) —
        see visual_onoma_to_wave_tpu/metrics.py. When a vocoder is loaded
        AND the corpus was preprocessed with --save-audio, it also reports
        the WAVEFORM-domain multi-resolution STFT distance (mrstft_sc/_mag)
        of the vocoded teacher-forced mel vs the ground-truth audio — the
        full-stack metric the mel-domain ones cannot provide (single-process
        runs only; the vocode pass is not wired as a collective).
        """
        sums = {k: 0.0 for k in LOSS_KEYS}
        wave_gt: dict[str, pathlib.Path] = {}
        if metrics:
            from visual_onoma_to_wave_tpu.metrics import batch_quality_metrics
            sums.update({"mel_l1": 0.0, "mcd": 0.0, "mcd_voiced": 0.0,
                         "mcd_dtw": 0.0})
            audio_root = pathlib.Path(self.config.path.preprocessed) / "audio"
            if (self.vocoder_params is not None and self.n_proc == 1
                    and audio_root.is_dir()):
                wave_gt = {p.stem: p for p in audio_root.glob("*/*.npy")}
        if wave_gt:
            from visual_onoma_to_wave_tpu.metrics import mrstft_distance
            from visual_onoma_to_wave_tpu.models.vocoder import (
                get_vocoder, vocoder_infer)
            voc_gen = get_vocoder(self.config.model.vocoder_model,
                                  **dict(self.config.model.vocoder_kwargs))
            hop = self.config.audio.stft.hop_length
            sums.update({"mrstft_sc": 0.0, "mrstft_mag": 0.0})
            n_wave = 0
        n = 0
        for batch in self.val_ds.batches(group_size=1, shuffle=False):
            jb = self._place(_jit_batch(batch))
            losses, outputs = self.eval_step(self.state, jb)
            bs = batch["texts"].shape[0]
            for k in LOSS_KEYS:
                sums[k] += float(losses[k]) * bs
            if metrics:
                infer_in = {k: jb[k] for k in
                            ("audiotypes", "texts", "src_lens", "image_cells")
                            if k in jb}
                fr = self.synth_step(self.state, infer_in)
                tf_mel, fr_mel, fr_lens = (
                    outputs["postnet_mel"], fr["postnet_mel"], fr["mel_lens"])
                if self.n_proc > 1 and bs % self.mesh.size == 0:
                    # batch-sharded outputs are not fully addressable on any
                    # one host: all-gather them (collective — every process
                    # runs this metrics pass). Replicated ragged tails are
                    # already host-readable.
                    tf_mel, fr_mel, fr_lens = host_tree(
                        (tf_mel, fr_mel, fr_lens))
                q = batch_quality_metrics(
                    np.asarray(tf_mel),
                    np.asarray(fr_mel),
                    np.asarray(fr_lens),
                    np.asarray(batch["mels"]),
                    np.asarray(batch["mel_lens"]))
                for k, v in q.items():
                    sums[k] += v
                if wave_gt:
                    import jax.numpy as jnp
                    mel_lens = np.asarray(batch["mel_lens"])
                    # Mask batch-pad frames to the mel silence floor before
                    # vocoding: postnet output at pad positions is arbitrary
                    # (never masked in the model), and the convolutional
                    # generator's receptive halo would bleed it into the
                    # scored tail of every non-longest item — making the
                    # metric depend on batch composition.
                    tf = np.array(tf_mel, np.float32)
                    pad = (np.arange(tf.shape[1])[None, :]
                           >= mel_lens[:, None])
                    tf[pad] = float(np.log(1e-5))
                    wavs, _ = vocoder_infer(
                        self.vocoder_params, jnp.asarray(tf),
                        gen=voc_gen, model=self.config.model.vocoder_model)
                    wavs = np.asarray(jax.device_get(wavs))
                    for b, name in enumerate(batch["names"]):
                        p = wave_gt.get(name)
                        if p is None:
                            continue
                        gt_wav = np.load(p)
                        pred = np.clip(
                            wavs[b, : int(mel_lens[b]) * hop], -1.0, 1.0)
                        d = mrstft_distance(pred, gt_wav)
                        sums["mrstft_sc"] += d["sc"]
                        sums["mrstft_mag"] += d["mag"]
                        n_wave += 1
            n += bs
        means = {k: (v / n if n else float("nan")) for k, v in sums.items()}
        if wave_gt:
            for k in ("mrstft_sc", "mrstft_mag"):
                means[k] = sums[k] / n_wave if n_wave else float("nan")
        if step is not None:
            self.val_log.text(
                f"validation step {step}: total {means['total_loss']:.4f}")
        return means

    # ------------------------------------------------------------------
    def _synth_sample(self, step: int) -> None:
        """Synthesize one val sample (predicted durations) + its teacher-forced
        reconstruction, log audio/figures (reference utils/tools.py:180-241)."""
        try:
            batch = next(self.val_ds.batches(group_size=1, shuffle=True,
                                             seed=step))
        except StopIteration:
            return
        jb = _jit_batch(batch)
        infer_in = {k: jb[k] for k in
                    ("audiotypes", "texts", "src_lens") if k in jb}
        if "image_cells" in jb:
            infer_in["image_cells"] = jb["image_cells"]
        if self.n_proc > 1:
            # one sample: replicate it — every process must join the global
            # program (outputs land replicated, so the primary can read
            # them), but only the primary writes figures/audio below
            infer_in = replicate(infer_in, self.mesh)
        out = self.synth_step(self.state, infer_in)
        if self.n_proc > 1:
            # fetch the (replicated) outputs to host BEFORE the primary
            # gate: everything below must be plain numpy, because eager
            # ops on global arrays issued by a single process would try to
            # drive devices this process doesn't own
            out = jax.device_get(out)
        if not is_primary():
            return
        mel_pred = np.asarray(out["postnet_mel"][0])
        mel_len = int(out["mel_lens"][0])
        gt_len = int(batch["mel_lens"][0])
        from visual_onoma_to_wave_tpu.utils.plotting import (
            expand_char_values, plot_mel)
        # target-energy contour expanded by the target durations, identical
        # on both panels, char boundaries as dotted vlines, energy axis
        # pinned to the corpus stats — the reference's mel+energy figure
        # (reference utils/tools.py:180-241 synth_one_sample, :243-303)
        energies = char_breaks = energy_ylim = None
        if "energies" in batch:
            n_src = int(batch["src_lens"][0])
            dur = np.asarray(batch["durations"][0][:n_src])
            e = expand_char_values(
                np.asarray(batch["energies"][0][:n_src]), dur)
            energies = [e[:max(mel_len, 1)], e[:gt_len]]
            char_breaks = [np.insert(np.cumsum(dur), 0, 0)] * 2
            es = self.metadata.energy_stats
            energy_ylim = (es.min, es.max)
        strip = None
        if "image_cells" in batch:
            n_src = int(batch["src_lens"][0])
            cells = np.asarray(batch["image_cells"][0][:n_src])  # (C, H, W)
            strip = (cells.transpose(1, 0, 2).reshape(cells.shape[1], -1)
                     * 255).astype(np.uint8)
        fig = plot_mel([
            (mel_pred[:max(mel_len, 1)], f"synthesized (step {step})"),
            (batch["mels"][0][:gt_len], "ground truth"),
        ], energies=energies, char_breaks=char_breaks,
            energy_ylim=energy_ylim, input_image=strip)
        self.train_log.figure(step, "Synth/mel", fig)
        if self.vocoder_params is not None:
            from visual_onoma_to_wave_tpu.models.vocoder import (
                get_vocoder, vocoder_infer)
            import jax.numpy as jnp
            from visual_onoma_to_wave_tpu.data.audio_io import write_wav
            name = batch["names"][0]
            sr = self.config.audio.sampling_rate
            kind = self.config.model.vocoder_model
            # honor any generator architecture overrides (vocoder_kwargs) —
            # self-trained reduced-size vocoders differ from the family
            # default (same resolution as synthesis._vocoder_module)
            gen = get_vocoder(kind, **dict(self.config.model.vocoder_kwargs))
            # synthesized (predicted durations) + reconstruction from the
            # ground-truth mel — the pair the reference writes per sample
            # (reference utils/tools.py:180-241, evaluate.py:58-103)
            for tag, m in (("synthesis", mel_pred[:max(mel_len, 1)]),
                           ("reconstruction", batch["mels"][0][:gt_len])):
                wav, _ = vocoder_infer(self.vocoder_params,
                                       jnp.asarray(np.asarray(m)[None]),
                                       gen=gen, model=kind)
                wav_np = np.asarray(wav[0])
                self.train_log.audio(step, f"Synth/{tag}", wav_np, sr)
                write_wav(self.result_dir / "Val" / f"{step}_{name}_{tag}.wav",
                          np.clip(wav_np, -1, 1), sr)
