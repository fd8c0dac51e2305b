"""Preprocessing orchestrator: formatted corpus -> training artifacts.

Behavioral re-design of reference scripts/preprocessor/preprocessor.py
(build_from_path, 4 passes) with the DSP moved onto the TPU:

  pass 1  feature extraction — clips are bucketed by padded length and
          processed in device BATCHES through the fused `clip_features` jit
          (ops/stft.py): one STFT per clip shared by mel/energy/kurtosis,
          vmapped across the bucket. The reference runs torchaudio per clip
          under joblib (preprocessor.py:64-66).
  pass 2  visual-onomatopoeia rendering (host, PIL).
  pass 3  feature-space augmentation (repeat / consecutive, numpy + PIL).
  pass 4  energy/kurtosis normalization (IQR outlier removal + running
          scaler), stats.json, train/val/test split writing.

Artifact layout and file formats are identical to the reference, so
preprocessed directories are interchangeable between the two frameworks.
"""
from __future__ import annotations

import json
import pathlib
import random
import shutil
from dataclasses import dataclass

import numpy as np
from PIL import Image

from visual_onoma_to_wave_tpu.config import Config
from visual_onoma_to_wave_tpu.data.alignment import align_tier
from visual_onoma_to_wave_tpu.data.audio_io import load_audio
from visual_onoma_to_wave_tpu.data.labels import read_textgrid
from visual_onoma_to_wave_tpu.data.renderer import (
    VisualTextRenderer,
    compute_visualtext_info,
)

MAX_CHARS = 48          # static char-axis bucket for device kernels
BATCH_CLIPS = 16        # clips per device batch
NUM_HOST_WORKERS = 8    # host IO thread pool (reference joblib n_jobs)


def _get_basename(font_stem: str, fontsize: int, stem: str, ext: str = "") -> str:
    """{font}_{fontsize}pt_{stem}{ext} with spaces removed and '_' -> '-'
    (reference preprocessor.py:246-258)."""
    base = stem.replace(" ", "").replace("_", "-")
    return f"{font_stem}_{fontsize}pt_{base}{ext}"


def _is_traindata(savename: str, valtest_id) -> bool:
    """Third dash-field numbering routes to train vs val/test
    (reference preprocessor.py:359-364)."""
    return int(savename.split("-")[2]) not in set(valtest_id)


@dataclass
class ClipTask:
    label: str
    line: str
    basename: str
    text: str
    audio: np.ndarray          # trimmed, float32 @ sampling_rate
    durations: np.ndarray      # int32 (n_chars,)


class Preprocessor:
    def __init__(self, config: Config):
        self.config = config
        self.paths = config.path
        self.sr = config.audio.sampling_rate
        st = config.audio.stft
        self.n_fft, self.hop, self.win = st.filter_length, st.hop_length, st.win_length
        self.margin_frame = st.margin_frame
        mel = config.audio.mel
        self.n_mels, self.fmin, self.fmax = mel.n_mel_channels, mel.mel_fmin, mel.mel_fmax
        self.fontsize = config.visual_text.fontsize
        self.font_stem = pathlib.Path(config.path.font).stem
        self.out = pathlib.Path(self.paths.preprocessed)
        self.formatted = pathlib.Path(self.paths.formatted)
        self._device_fn = None

    # ------------------------------------------------------------------
    # device DSP
    # ------------------------------------------------------------------
    def _features_batched(self, audios: list[np.ndarray],
                          durations: list[np.ndarray]):
        """Run the fused feature kernel over a batch of clips.

        Pads clips to a shared power-of-two-ish bucket (after host reflect
        pre-padding so zero-pad can't perturb torchaudio-center semantics) and
        vmaps on device. Returns per-clip (logmel (T_i, M), char_energy,
        kurtosis) truncated to sum(durations).
        """
        import jax
        import jax.numpy as jnp
        from visual_onoma_to_wave_tpu.ops.stft import (
            clip_features, hann_window, melscale_fbanks,
        )

        if self._device_fn is None:
            self._window = jnp.asarray(hann_window(self.win))
            self._melfb = jnp.asarray(melscale_fbanks(
                self.n_fft // 2 + 1, self.fmin, self.fmax, self.n_mels, self.sr))
            # On TPU the fused Pallas frontend (ops/pallas_mel.py) keeps the
            # (F, T) spectrogram out of HBM entirely; elsewhere fall back to
            # the jnp/rfft path with identical semantics.
            self._use_pallas = (jax.devices()[0].platform == "tpu"
                                and self.n_fft % self.hop == 0)
            self._device_fn = clip_features

        pad = self.n_fft // 2
        pre = [np.pad(np.clip(a, -1, 1), pad, mode="reflect") for a in audios]
        max_len = max(len(p) for p in pre)
        # bucket to multiples of 32 hops to bound jit specializations
        bucket = self.n_fft + ((max_len - self.n_fft + 32 * self.hop - 1)
                               // (32 * self.hop)) * 32 * self.hop
        batch_audio = np.zeros((len(pre), bucket), np.float32)
        for i, p in enumerate(pre):
            batch_audio[i, : len(p)] = p
        dur_pad = np.zeros((len(pre), MAX_CHARS), np.int32)
        for i, d in enumerate(durations):
            dur_pad[i, : len(d)] = d

        if self._use_pallas:
            from visual_onoma_to_wave_tpu.ops.pallas_mel import (
                pallas_clip_features,
            )
            logmel, char_e, kurt = pallas_clip_features(
                jnp.asarray(batch_audio), jnp.asarray(dur_pad), MAX_CHARS,
                self.n_fft, self.hop, self.win, self.n_mels, self.sr,
                self.fmin, self.fmax,
            )
        else:
            logmel, char_e, kurt = self._device_fn(
                jnp.asarray(batch_audio), jnp.asarray(dur_pad),
                self._window, self._melfb, MAX_CHARS,
                self.n_fft, self.hop, self.win,
            )
        logmel = np.asarray(logmel)
        char_e = np.asarray(char_e)
        kurt = np.asarray(kurt)
        out = []
        for i, d in enumerate(durations):
            total = int(d.sum())
            n = len(d)
            out.append((logmel[i, :, :total].T, char_e[i, :n], kurt[i, :n]))
        return out

    # ------------------------------------------------------------------
    # pass 1: per-clip feature extraction
    # ------------------------------------------------------------------
    def _load_clip(self, label: str, line: str) -> ClipTask | None:
        """Parse a data.txt row, apply all skip rules
        (reference preprocessor.py:366-396), return the aligned clip."""
        fields = line.replace("\n", "").split("|")
        if len(fields) != 6:
            return None
        text_base, audio_base, text, _, conf, acc = fields
        ds = self.config.dataset
        if float(conf) < ds.confidence_score_border:
            return None
        if float(acc) < ds.acceptance_score_border:
            return None
        tg_path = self.formatted / "TextGrid" / label / f"{text_base}.TextGrid"
        if not tg_path.exists():
            return None
        wav_path = self.formatted / "audio" / label / f"{audio_base}.wav"
        if not wav_path.exists():
            return None
        wav = load_audio(wav_path, self.sr)
        intervals = read_textgrid(tg_path)
        al = align_tier(intervals, len(wav), self.sr, self.hop, self.margin_frame)
        if len(al.characters) != len(text):
            return None
        if al.start >= al.end:
            return None
        if len(wav[int(self.sr * al.start): int(self.sr * al.end)]) < len(wav) / 15:
            return None
        if len(text) > MAX_CHARS or al.durations.sum() <= 0:
            return None
        trimmed = wav[int(self.sr * al.start):].astype(np.float32)
        basename = _get_basename(self.font_stem, self.fontsize, text_base)
        return ClipTask(label, line, basename, text, trimmed, al.durations)

    def _save_clip(self, t: ClipTask, mel: np.ndarray, energy: np.ndarray,
                   kurtosis: np.ndarray) -> None:
        np.save(self.out / "duration" / t.label / f"{t.basename}.npy", t.durations)
        np.save(self.out / "energy" / t.label / f"{t.basename}.npy", energy)
        np.save(self.out / "kurtosis" / t.label / f"{t.basename}.npy", kurtosis)
        np.save(self.out / "mel" / t.label / f"{t.basename}.npy", mel)
        self._write_info(t.label, t.basename, t.text)

    def _write_info(self, label: str, savename: str, text: str) -> None:
        info = f"{savename}|{label}|{self.fontsize}|{self.font_stem}|{text}"
        sub = "train" if _is_traindata(savename, self.config.dataset.valtest_id) else "val_test"
        p = self.out / "intermediate" / "info" / sub / label / f"{savename}.txt"
        p.write_text(info)

    def _makedirs(self, label: str) -> None:
        for d in ("duration", "energy", "kurtosis", "mel"):
            (self.out / d / label).mkdir(parents=True, exist_ok=True)
        (self.out / "image" / "png" / label).mkdir(parents=True, exist_ok=True)
        (self.out / "image" / "width" / label).mkdir(parents=True, exist_ok=True)
        for sub in ("train", "val_test"):
            (self.out / "intermediate" / "info" / sub / label).mkdir(
                parents=True, exist_ok=True)

    # ------------------------------------------------------------------
    # main build
    # ------------------------------------------------------------------
    def build(self, verbose: bool = True) -> dict:
        cfg = self.config
        wav_glob = sorted({p.parent.name for p in (self.formatted / "audio").glob("*/*.wav")})
        if cfg.dataset.extract_labels:
            labels = sorted(set(wav_glob) & set(cfg.dataset.extract_labels))
        else:
            labels = wav_glob
        self.labels = labels

        audio_labels = {label: i for i, label in enumerate(labels)}
        width_dumps: dict[str, tuple] = {}
        per_label_tasks: dict[str, list[ClipTask]] = {}
        n_frames_cnt = 0

        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=NUM_HOST_WORKERS)

        # ---- pass 1: features -------------------------------------------------
        for label in labels:
            self._makedirs(label)
            lines = (self.formatted / "text" / label / "data.txt").read_text().splitlines()
            # host IO (wav read, TextGrid parse, alignment) fans out over the
            # thread pool — the analog of the reference's joblib workers
            tasks = [t for t in pool.map(
                lambda ln: self._load_clip(label, ln),
                [ln for ln in lines if ln.strip()]) if t is not None]
            # device batches
            for i in range(0, len(tasks), BATCH_CLIPS):
                chunk = tasks[i : i + BATCH_CLIPS]
                feats = self._features_batched(
                    [t.audio for t in chunk], [t.durations for t in chunk])
                for t, (mel, energy, kurt) in zip(chunk, feats):
                    self._save_clip(t, mel, energy, kurt)
                    n_frames_cnt += mel.shape[0]
            wav_lens = np.array([len(t.audio) for t in tasks])
            text_lens = np.array([len(t.text) for t in tasks])
            if len(tasks):
                width_dumps[label] = compute_visualtext_info(
                    wav_lens, text_lens, self.sr, self.fontsize)
            per_label_tasks[label] = tasks
            if verbose:
                print(f"label {label}: kept {len(tasks)}/{len(lines)}")

        with open(self.out / "audiotype.json", "w") as f:
            json.dump(audio_labels, f)
        with open(self.out / "label_width.json", "w") as f:
            json.dump({k: list(v) for k, v in width_dumps.items()}, f)

        # ---- pass 2: visual onomatopoeia --------------------------------------
        entire_max_width = 0
        for label in labels:
            if label not in width_dumps:
                continue
            cps, max_w, _ = width_dumps[label]
            renderer = VisualTextRenderer.from_config(cfg, chars_per_sec=cps)

            def render_one(t, label=label, renderer=renderer):
                renderer.draw(
                    t.text, len(t.audio) / self.sr,
                    save_image=self.out / "image" / "png" / label / f"{t.basename}.png",
                    save_width=self.out / "image" / "width" / label / f"{t.basename}.npy",
                )

            list(pool.map(render_one, per_label_tasks[label]))
            entire_max_width = max(entire_max_width, int(max_w))
        with open(self.out / "visual_text.json", "w") as f:
            json.dump({"max_pixelsize": [int(entire_max_width)],
                       "height": [self.fontsize]}, f)

        # ---- pass 3: augmentation ----------------------------------------------
        for label in labels:
            n_frames_cnt += sum(pool.map(
                lambda t, label=label: self._augment(label, t.basename, t.text),
                per_label_tasks[label]))
        pool.shutdown()

        # ---- pass 4: normalization + metadata ----------------------------------
        stats = self._normalize_features()
        with open(self.out / "stats.json", "w") as f:
            json.dump(stats, f)
        self._write_splits()
        shutil.rmtree(self.out / "intermediate")
        hours = n_frames_cnt * self.hop / self.sr / 3600
        if verbose:
            print(f"preprocessing finished: {hours:.2f} hours of frames")
        return {"labels": labels, "hours": hours}

    # ------------------------------------------------------------------
    # pass 3: augmentation (reference preprocessor.py:468-622)
    # ------------------------------------------------------------------
    def _load_features(self, label: str, basename: str):
        duration = np.load(self.out / "duration" / label / f"{basename}.npy")
        energy = np.load(self.out / "energy" / label / f"{basename}.npy")
        kurtosis = np.load(self.out / "kurtosis" / label / f"{basename}.npy")
        mel = np.load(self.out / "mel" / label / f"{basename}.npy").T  # (M, T)
        image = Image.open(self.out / "image" / "png" / label / f"{basename}.png")
        width = np.load(self.out / "image" / "width" / label / f"{basename}.npy")
        return duration, energy, kurtosis, mel, image, width

    def _save_features(self, label, savename, duration, energy, kurtosis,
                       mel, image, width, text):
        np.save(self.out / "duration" / label / f"{savename}.npy", duration)
        np.save(self.out / "energy" / label / f"{savename}.npy", energy)
        np.save(self.out / "kurtosis" / label / f"{savename}.npy", kurtosis)
        np.save(self.out / "mel" / label / f"{savename}.npy", mel.T)
        image.save(self.out / "image" / "png" / label / f"{savename}.png")
        np.save(self.out / "image" / "width" / label / f"{savename}.npy", width)
        self._write_info(label, savename, text)

    @staticmethod
    def _hconcat(images: list[Image.Image]) -> Image.Image:
        total_w = sum(im.width for im in images)
        dst = Image.new("RGB", (total_w, images[0].height))
        x = 0
        for im in images:
            dst.paste(im, (x, 0))
            x += im.width
        return dst

    def _repeat_aug(self, n: int, label: str, basename: str, savename: str,
                    text: str) -> int:
        """Tile every feature n times; h-concat the image
        (reference _repeataug, preprocessor.py:503-542)."""
        duration, energy, kurtosis, mel, image, width = self._load_features(label, basename)
        self._save_features(
            label, savename,
            np.tile(duration, n), np.tile(energy, n), np.tile(kurtosis, n),
            np.tile(mel, (1, n)), self._hconcat([image] * n), np.tile(width, n),
            text * n,
        )
        return mel.shape[1] * n

    def _consecutive_aug(self, count: int, pos: int, label: str, basename: str,
                         savename: str, text: str) -> tuple[int, str]:
        """Insert count-1 copies of character `pos` (features via np.insert,
        mel/image via segment tiling; reference _consecutiveaug,
        preprocessor.py:544-595)."""
        duration, energy, kurtosis, mel, image, width = self._load_features(label, basename)
        k = count - 1

        def rep(v):
            return np.insert(v, pos, [v[pos]] * k)

        t0, t1 = int(duration[:pos].sum()), int(duration[: pos + 1].sum())
        seg = np.tile(mel[:, t0:t1], (1, k))
        mel_rep = np.insert(mel, [t0], seg, axis=1)

        w0, w1 = int(width[:pos].sum()), int(width[: pos + 1].sum())
        seg_im = image.crop((w0, 0, w1, image.height))
        left = image.crop((0, 0, w0, image.height))
        right = image.crop((w1, 0, image.width, image.height))
        im_rep = self._hconcat([left] + [seg_im] * count + [right])

        text_rep = text[:pos] + text[pos] * count + text[pos + 1 :]
        self._save_features(label, savename, rep(duration), rep(energy),
                            rep(kurtosis), mel_rep, im_rep, rep(width), text_rep)
        return mel_rep.shape[1], text_rep

    @staticmethod
    def _consecutive_pos(text: str) -> int | None:
        """Middle of the first run of >=3 identical characters
        (reference _get_consecutive_pos, preprocessor.py:597-622)."""
        run_start, run_len, prev = 0, 1, ""
        for i, ch in enumerate(text):
            if ch == prev:
                if run_len == 1:
                    run_start = i - 1
                run_len += 1
            else:
                if run_len >= 3:
                    return run_start + (i - 1 - run_start) // 2
                run_start, run_len, prev = i, 1, ch
        if run_len >= 3:
            return run_start + (len(text) - 1 - run_start) // 2
        return None

    def _augment(self, label: str, basename: str, text: str) -> int:
        aug = self.config.augmentation
        frames = 0
        n = 2
        while n <= aug.repeat_num and len(text) <= aug.max_length:
            frames += self._repeat_aug(n, label, basename, f"{basename}-repeat{n}", text)
            n += 1
        m = 1
        while m <= aug.first_consecutive and len(text) <= aug.max_length:
            f, _ = self._consecutive_aug(
                m + 1, 0, label, basename, f"{basename}-firstconsecutive{m}", text)
            frames += f
            m += 1
        pos = self._consecutive_pos(text)
        c = 1
        while c <= aug.consecutive_num and len(text) <= aug.max_length and pos is not None:
            savename = f"{basename}-consecutive{c}"
            f, ret_text = self._consecutive_aug(c + 1, pos, label, basename, savename, text)
            frames += f
            n = 2
            ret_base = savename
            while n <= aug.repeat_num and len(ret_text) <= aug.max_length:
                frames += self._repeat_aug(
                    n, label, ret_base, f"{ret_base}-repeat{n}", ret_text)
                n += 1
            c += 1
        return frames

    # ------------------------------------------------------------------
    # pass 4: normalization + splits (reference preprocessor.py:113-161,624-660)
    # ------------------------------------------------------------------
    @staticmethod
    def _remove_outlier(values: np.ndarray) -> np.ndarray:
        p25, p75 = np.percentile(values, 25), np.percentile(values, 75)
        lower, upper = p25 - 1.5 * (p75 - p25), p75 + 1.5 * (p75 - p25)
        return values[np.logical_and(values > lower, values < upper)]

    def _normalize_features(self) -> dict:
        stats = {}
        for name in ("energy", "kurtosis"):
            files = sorted((self.out / name).glob("*/*.npy"))
            # running mean/std over outlier-filtered values
            n, mean, m2 = 0, 0.0, 0.0
            for f in files:
                v = self._remove_outlier(np.load(f).astype(np.float64))
                for x in (v,):
                    cnt = x.size
                    if cnt == 0:
                        continue
                    delta = x.mean() - mean
                    tot = n + cnt
                    mean += delta * cnt / tot
                    m2 += x.var() * cnt + delta ** 2 * n * cnt / tot
                    n = tot
            std = float(np.sqrt(m2 / n)) if n else 1.0
            vmin, vmax = np.inf, -np.inf
            for f in files:
                v = (np.load(f) - mean) / std
                np.save(f, v)
                if v.size:
                    vmin, vmax = min(vmin, float(v.min())), max(vmax, float(v.max()))
            stats[name] = [vmin, vmax, float(mean), std]
        return stats

    def _write_splits(self) -> None:
        train_files = sorted(
            (self.out / "intermediate" / "info" / "train").glob("*/*.txt"))
        with open(self.out / "train.txt", "w") as f:
            for p in train_files:
                f.write(p.read_text() + "\n")
        vt_files = sorted(
            (self.out / "intermediate" / "info" / "val_test").glob("*/*.txt"))
        rnd = random.Random(self.config.train.seed)
        rnd.shuffle(vt_files)
        half = len(vt_files) // 2
        for fname, chunk in (("val.txt", vt_files[:half]), ("test.txt", vt_files[half:])):
            with open(self.out / fname, "w") as f:
                for p in chunk:
                    f.write(p.read_text() + "\n")
        # persist the vocabulary: serving from a checkpoint then needs only
        # the metadata jsons, not the split txt files
        from visual_onoma_to_wave_tpu.data.symbols import (
            build_symbol_map, save_symbol_map)
        save_symbol_map(self.out, build_symbol_map(self.out))
