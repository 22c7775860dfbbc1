"""Configuration surface for shmgan_tpu.

One dataclass tree replaces the reference's argparse flags (main.py:30-70) plus the
constants hardcoded inside the trainer class (ShmGANwithSSpecSeg.py:122-213).  Flags
that are *dead* in the reference (parsed but never used, or overridden by hardcoded
constants) are kept for CLI compatibility and documented as such.

Reference flag -> field map (reference file:line):
  --image_size (main.py:42)            -> model.image_size           (default 128)
  --batch_size (main.py:43)            -> train.batch_size           (default 1; the
                                           rebuild is batch-polymorphic, reference was
                                           hardwired to 1)
  --num_epochs (main.py:44)            -> train.num_epochs           (default 200)
  --n_critic (main.py:45)              -> train.n_critic             (DEAD in reference)
  --log_step (main.py:46)              -> train.log_step
  --checkpoint_save_step (main.py:47)  -> train.checkpoint_save_step
  --filter_size (main.py:50)           -> model.filter_size          (default 64)
  --c_dim (main.py:51)                 -> model.c_dim                (re-hardcoded to 5
                                           at ShmGANwithSSpecSeg.py:192)
  --g_lr / --d_lr (main.py:52-53)      -> train.g_lr / train.d_lr    (reference uses the
                                           G schedule for BOTH optimizers; d_lr is dead.
                                           We honor d_lr and default it equal to g_lr.)
  --beta1/--beta2 (main.py:54-55)      -> train.beta1 / train.beta2  (0.5 / 0.99)
  --num_iteration_decay (main.py:56)   -> train.num_iteration_decay  (DEAD in reference)
  --d_repeat_num (main.py:57)          -> model.d_repeat_num         (DEAD in reference)
  --est_diffuse (main.py:36)           -> data.est_diffuse
  --flip (main.py:37)                  -> data.flip                  (reference polarity
                                           was inverted + frozen at dataset build,
                                           datasetLoader.py:61; we implement the intent:
                                           per-step random paired flip)
  --mode (main.py:38)                  -> cli mode
  --calc_metrics (main.py:39)          -> eval.calc_metrics
  --delete_old_checkpoints (main.py:40)-> train.delete_old_checkpoints (reference
                                           hardcodes False at :187)
  dirs (main.py:60-66)                 -> data.* / train.* dirs
  --num_iteration (main.py:69)         -> train.num_iteration        (DEAD in reference)

Trainer-class constants (ShmGANwithSSpecSeg.py):
  seed=25 (:157), randomness=0.50 (:158), dropout=0.2 (:159), TARGET_LABELS=0.90 (:161),
  use_lsgan (:163), decay_steps=10000 rate=0.95 (:169-171), train_G_after=0 (:190),
  g_conv_dim=64 / g_repeat_num=6 (:193-194), init N(0,0.02) (:200), alpha=0.84 (:212).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ModelConfig:
    image_size: int = 128
    filter_size: int = 64          # base conv width for G and D
    c_dim: int = 5                 # number of polarimetric domains (I0,I45,I90,I135,ED)
    d_repeat_num: int = 6          # dead in reference; kept for CLI parity
    # SpecSeg U-Net widths (SpecSeg.py:34-88): 16->32->64->128->256
    specseg_base_filters: int = 16
    # SpecSeg input channels. 1 = reference parity (standardized luma only,
    # ShmGANwithSSpecSeg.py:930-931). 2 = chroma-aware divergence: channel 2
    # is the dichromatic chroma prior (ops/specprior.py) computed from the
    # same RGB the luma came from, so the net can LEARN where to trust the
    # physics cue instead of the fixed output-mean fusion of
    # eval.mask_chroma_prior. Changes the first conv's kernel shape — the
    # parity param goldens apply to in_channels=1 only.
    specseg_in_channels: int = 1
    # Instance-norm epsilon (tfa InstanceNormalization eps, ShmGANwithSSpecSeg.py:245)
    instance_norm_eps: float = 1e-6
    leaky_relu_slope: float = 0.2  # tf.nn.leaky_relu default alpha
    # Discriminator GaussianNoise stddev (ShmGANwithSSpecSeg.py:352)
    d_input_noise: float = 0.1
    # Discriminator dropout (ShmGANwithSSpecSeg.py:159,363)
    d_dropout: float = 0.2
    # Parameter init stddev, DCGAN-style N(0, 0.02) (ShmGANwithSSpecSeg.py:200)
    init_stddev: float = 0.02
    # Compute dtype for the model bodies. Params are always f32; bf16 compute
    # engages the MXU's native precision and is the production default
    # (convergence validated against f32 over 200-step trajectories, DESIGN.md
    # §2/§6). Set "float32" for strict-parity numerics — parity/golden tests
    # pin it explicitly.
    compute_dtype: str = "bfloat16"
    # Use the fused Pallas instance-norm kernel (ops/pallas/instance_norm.py)
    # inside G and D. TPU-only; identical math (A/B benched, see DESIGN.md).
    use_pallas_instance_norm: bool = False
    # Generator upsampling: "conv_transpose" = reference parity
    # (ShmGANwithSSpecSeg.py:298-319); "resize_conv" = nearest-resize + Conv3x3
    # (checkerboard-free, identical parameter count) — the round-3 quality lever
    # for the residual ConvTranspose artifacts seen inside highlight regions.
    upsample_mode: str = "conv_transpose"


@dataclass
class TrainConfig:
    batch_size: int = 1
    num_epochs: int = 200
    n_critic: int = 5              # dead in reference; kept for CLI parity
    log_step: int = 1
    checkpoint_save_step: int = 10
    g_lr: float = 2e-5
    d_lr: float = 2e-5
    beta1: float = 0.5
    beta2: float = 0.99
    adam_eps: float = 1e-7         # keras Adam default epsilon
    lr_decay_steps: int = 10000    # ShmGANwithSSpecSeg.py:169-171
    lr_decay_rate: float = 0.95
    num_iteration: int = 20000     # dead in reference
    num_iteration_decay: int = 100000  # dead in reference
    grad_clip: float = 1.0         # elementwise clip ±1 (ShmGANwithSSpecSeg.py:860,869)
    seed: int = 25                 # ShmGANwithSSpecSeg.py:157
    randomness: float = 0.50       # Bernoulli drop prob for input channels (:158)
    target_label: float = 0.90     # base label smoothing value (:161)
    target_label_low: float = 0.8  # per-step smoothing range (train loop :986)
    target_label_high: float = 1.2
    train_G_after: int = 0         # epochs before G updates begin (:190)
    use_lsgan: bool = True
    style_weight: float = 100.0    # NST loss weights (:824-825)
    content_weight: float = 1.0
    zhao_alpha: float = 0.84       # Zhao et al. SSIM+L1 alpha (:212; dead in totals)
    delete_old_checkpoints: bool = False
    checkpoint_save_dir: str = "./checkpoints"
    model_save_dir: str = "./models"
    result_dir: str = "./results"
    log_dir: str = "./logs/train"
    checkpoint_max_to_keep: int = 3
    # Per-epoch deterministic data shuffling (identical order on every host,
    # derived from (seed, epoch)). Default False = reference parity: the
    # reference iterates in fixed file order (ShmGANwithSSpecSeg.py:973-976).
    shuffle: bool = False
    # Parity mode: scalar per-step Bernoulli channel dropout shared across the batch
    # (the reference semantics at batch=1).  When False, dropout is drawn per-sample,
    # which is the better-training generalization for batch>1.
    scalar_channel_dropout: bool = True
    # ---- Quality-mode training options (all default to reference-parity behavior;
    # documented in README's divergence table and tested in tests/test_step.py).
    #
    # live_g1: give the generator gradients through the G1 pass — the exact input
    # pattern used at inference (surviving Y channels + zeros, ED target). The
    # reference gates G out of that pass (G.trainable=False inside the tape,
    # ShmGANwithSSpecSeg.py:497-538), so its generator is never trained on the
    # configuration its own test path uses (test.py:227-235). The G1 adversarial
    # gradient flows through a frozen-parameter D evaluation (no D leak).
    live_g1: bool = False
    # Extra reconstruction weight on the G1 output vs ED (L1 + SSIM-log) — teaches
    # the single-image inference configuration directly. Only active with live_g1.
    g1_recon_weight: float = 0.0
    # Probability that a sample's channel-dropout pattern is replaced by the
    # single-input inference pattern (exactly one polarized view kept, rest
    # dropped) — importance-samples the pattern inference uses (test.py:227-235),
    # which under plain Bernoulli(0.5) draws has probability 1/32 per slot.
    single_input_prob: float = 0.0
    # Compare generated/cyclic outputs against STANDARDIZED originals in the L1 and
    # feed the discriminator standardized originals. The reference mixes domains:
    # its L1 compares standardized-scale outputs against raw [0,1] originals
    # (ShmGANwithSSpecSeg.py:745-750) and its D sees standardized fakes vs raw
    # reals (:559-563 vs :638-642), making real/fake separable by scale alone.
    consistent_domains: bool = False
    # Auto-restore the latest checkpoint on train start (reference restores whenever
    # delete_old_checkpoints is False, ShmGANwithSSpecSeg.py:949-951)
    auto_resume: bool = True
    # Rematerialization of the heavy model passes inside the fused step.
    # "none" = store-everything (XLA default). "models" = jax.checkpoint around
    # each gradient-carrying model forward (live D, cyclic G, frozen D, and G1
    # when live_g1): the backward pass recomputes those forwards instead of
    # round-tripping their activations through HBM. The step is HBM-bandwidth
    # bound with ~2.6x MXU headroom (DESIGN.md roofline), so recompute FLOPs are
    # free where the saved traffic isn't. Numerics are exactly preserved
    # (tests/test_remat.py).
    remat: str = "none"
    # Exponential moving average of generator params (Karras et al. style),
    # maintained in-graph alongside the Adam update and used for eval/inference
    # when enabled. 0.0 = off (reference parity — the reference has no EMA).
    # The EMA tree ships in checkpoints only when enabled, so the default
    # checkpoint layout is unchanged.
    g_ema: float = 0.0


@dataclass
class DataConfig:
    data_dir: str = "./data/PolarizedSource"
    test_dir: str = "./data/test"
    diffuse_dir: str = "./data/test_diffuse"
    est_diffuse: bool = True       # synthesize ED from the 4 views when folder absent
    flip: bool = True              # per-step paired random up/down flip
    # Sub-folder names for the five aligned views. The reference supports two naming
    # schemes (datasetLoader.py:22-33); PSD naming is the active one there.
    view_dirs: tuple = ("I0", "I45", "I90", "I135", "ED")
    psd_view_dirs: tuple = ("I0", "I60", "I90", "I150", "ED")
    use_psd_naming: bool = False
    prefetch: int = 4              # host->device prefetch depth
    num_workers: int = 4           # decode/resize worker threads
    cache_in_memory: bool = True   # datasets are small; cache decoded f32 arrays


@dataclass
class MeshConfig:
    """Device-mesh / parallelism layout (ABSENT in the reference; SURVEY.md §2.2)."""
    data_axis: str = "data"
    model_axis: str = "model"
    # -1 means "all remaining devices"
    data_parallel: int = -1
    model_parallel: int = 1
    # Shard conv feature maps spatially (H) across the model axis for large images —
    # the vision analogue of sequence parallelism. Off by default (parity item: no).
    spatial_sharding: bool = False
    # Conv kernels with at least this many output channels get TP-sharded when
    # model_parallel > 1 (below it the collective cost outweighs the FLOP
    # split). Lowered in small-model tests/dryruns so TP is actually exercised.
    tp_min_channels: int = 256


@dataclass
class EvalConfig:
    calc_metrics: bool = False
    specseg_weights: str = "specsegv3_chkpt.h5"
    # Deploy the EMA generator tree (when the checkpoint carries one) for
    # test/serve/export — the weights EMA-run metrics were measured on
    # (ADVICE r2). False forces the raw last-step params.
    use_ema: bool = True
    # test-mode at each photo's ORIGINAL resolution (reflect-pad to a bucketed
    # shape, crop back — infer.make_native_infer_fn) instead of the
    # reference's forced square resize (test.py:81-94). Batch is per-file.
    native_resolution: bool = False
    # average SpecSeg probabilities over the dihedral views (flips, +
    # transposes when square) in every inference path — one k*B-batched
    # forward. Symmetrizes orientation bias the synthetic curriculum bakes in
    # (the round-3 real-photo OOD gap); off by default for strict parity.
    mask_tta: bool = False
    # fuse the dichromatic chroma prior (ops/specprior.py) into every
    # inference-path specular mask: the luma-only SpecSeg cannot distinguish
    # bright diffuse surfaces from highlights; the prior supplies the missing
    # chroma cue (+26% real-photo mask IoU, no eval domain regressed). Off by
    # default for strict parity with the reference's mask stage.
    mask_chroma_prior: bool = False
    # storage dtype for --mode export bundles ("" = keep the train dtype;
    # "float16" halves the artifact — loads cast back to float32)
    export_dtype: str = ""
    # restore this specific checkpoint step for test/serve/export (0 = the
    # latest). The trainer's keep-3 window usually holds the multi-metric
    # BEST step (quality_train.is_better_checkpoint) alongside the last one —
    # deploy the best, not merely the newest.
    checkpoint_step: int = 0


@dataclass
class ServeConfig:
    """Serving surface (ABSENT in the reference — test.py is an eager per-image
    loop; serve.py/serve_http.py are the deployable paths)."""
    host: str = "0.0.0.0"
    port: int = 8000
    batch_size: int = 1
    # when set, run the folder-watch daemon instead of the HTTP server
    watch_dir: str = ""
    # serve from an exported inference bundle (cli --mode export) instead of a
    # full training checkpoint
    weights_bundle: str = ""
    # >0 enables the HTTP request-batching window: concurrent requests of one
    # size aggregate into single device calls (bounded by serve batch_size)
    batch_window_ms: float = 0.0
    # image sizes to precompile engines for before accepting traffic
    # (--serve_warm_sizes "128,256" / "native,128"); empty = lazy compile on
    # first request
    warm_sizes: tuple = ()


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    serve: ServeConfig = field(default_factory=ServeConfig)
    mode: str = "train"

    @classmethod
    def from_args(cls, argv: Optional[list] = None) -> "Config":
        """Build a Config from a CLI surface mirroring the reference main.py:30-70."""
        p = argparse.ArgumentParser(description="SHMGAN-TPU: specular highlight mitigation")
        p.add_argument("--est_diffuse", type=_strtobool, default=True)
        p.add_argument("--flip", type=_strtobool, default=True)
        p.add_argument("--mode", type=str, default="train",
                       choices=["train", "test", "serve", "export", "bench"])
        p.add_argument("--serve_host", type=str, default="0.0.0.0")
        p.add_argument("--serve_port", type=int, default=8000)
        p.add_argument("--serve_batch_size", type=int, default=1)
        p.add_argument("--serve_watch_dir", type=str, default="")
        p.add_argument("--serve_weights_bundle", type=str, default="")
        p.add_argument("--serve_batch_window_ms", type=float, default=0.0)
        p.add_argument("--serve_warm_sizes", type=str, default="",
                       help="comma-separated image sizes (or 'native') to "
                            "precompile serving engines for at startup")
        p.add_argument("--calc_metrics", type=_strtobool, default=False)
        p.add_argument("--delete_old_checkpoints", type=_strtobool, default=False)
        p.add_argument("--image_size", type=int, default=128)
        p.add_argument("--batch_size", type=int, default=1)
        p.add_argument("--num_epochs", type=int, default=200)
        p.add_argument("--n_critic", type=int, default=5)
        p.add_argument("--log_step", type=int, default=1)
        p.add_argument("--checkpoint_save_step", type=int, default=10)
        p.add_argument("--filter_size", type=int, default=64)
        p.add_argument("--c_dim", type=int, default=5)
        p.add_argument("--g_lr", type=float, default=2e-5)
        p.add_argument("--d_lr", type=float, default=2e-5)
        p.add_argument("--beta1", type=float, default=0.5)
        p.add_argument("--beta2", type=float, default=0.99)
        p.add_argument("--num_iteration_decay", type=int, default=100000)
        p.add_argument("--d_repeat_num", type=int, default=6)
        p.add_argument("--data_dir", type=str, default="./data/PolarizedSource")
        p.add_argument("--test_dir", type=str, default="./data/test")
        p.add_argument("--diffuse_dir", type=str, default="./data/test_diffuse")
        p.add_argument("--model_save_dir", type=str, default="./models")
        p.add_argument("--checkpoint_save_dir", type=str, default="./checkpoints")
        p.add_argument("--result_dir", type=str, default="./results")
        p.add_argument("--log_dir", type=str, default="./logs/train")
        p.add_argument("--num_iteration", type=int, default=20000)
        p.add_argument("--specseg_weights", type=str, default="specsegv3_chkpt.h5")
        p.add_argument("--use_ema", type=_strtobool, default=True,
                       help="test/serve/export with the checkpoint's EMA "
                            "generator tree when present")
        p.add_argument("--native_resolution", type=_strtobool, default=False,
                       help="test-mode inference at each photo's own "
                            "resolution (no square resize)")
        p.add_argument("--mask_tta", type=_strtobool, default=False,
                       help="average the SpecSeg mask over dihedral "
                            "flip/transpose views at inference")
        p.add_argument("--mask_chroma_prior", type=_strtobool, default=False,
                       help="fuse the dichromatic chroma prior into "
                            "inference-path specular masks (ops/specprior.py)")
        p.add_argument("--export_dtype", type=str, default="",
                       choices=["", "float16", "bfloat16"],
                       help="storage dtype for --mode export bundles "
                            "(halves the artifact; loads cast to float32)")
        p.add_argument("--checkpoint_step", type=int, default=0,
                       help="restore this checkpoint step for test/serve/"
                            "export (0 = latest; keep-3 usually holds the "
                            "multi-metric best step too)")
        p.add_argument("--compute_dtype", type=str, default="bfloat16",
                       choices=["float32", "bfloat16"])
        p.add_argument("--upsample_mode", type=str, default="conv_transpose",
                       choices=["conv_transpose", "resize_conv"])
        p.add_argument("--specseg_in_channels", type=int, default=1,
                       choices=[1, 2],
                       help="SpecSeg input channels: 1 = parity (luma only), "
                            "2 = + dichromatic chroma prior channel "
                            "(ops/specprior.py; needs matching weights)")
        p.add_argument("--remat", type=str, default="none",
                       choices=["none", "models", "disc", "gen"],
                       help="rematerialize model forwards in the train step "
                            "backward (HBM-traffic vs recompute trade); "
                            "disc/gen remat only that model's forwards — "
                            "use when a config almost fits without remat")
        p.add_argument("--seed", type=int, default=25)
        p.add_argument("--data_parallel", type=int, default=-1)
        p.add_argument("--model_parallel", type=int, default=1)
        p.add_argument("--psd_naming", type=_strtobool, default=False)
        a = p.parse_args(argv)

        cfg = cls()
        cfg.mode = a.mode
        cfg.model = dataclasses.replace(
            cfg.model, image_size=a.image_size, filter_size=a.filter_size,
            c_dim=a.c_dim, d_repeat_num=a.d_repeat_num,
            compute_dtype=a.compute_dtype, upsample_mode=a.upsample_mode,
            specseg_in_channels=a.specseg_in_channels)
        cfg.train = dataclasses.replace(
            cfg.train, batch_size=a.batch_size, num_epochs=a.num_epochs,
            n_critic=a.n_critic, log_step=a.log_step,
            checkpoint_save_step=a.checkpoint_save_step, g_lr=a.g_lr, d_lr=a.d_lr,
            beta1=a.beta1, beta2=a.beta2, num_iteration_decay=a.num_iteration_decay,
            num_iteration=a.num_iteration, seed=a.seed,
            delete_old_checkpoints=a.delete_old_checkpoints,
            checkpoint_save_dir=a.checkpoint_save_dir, model_save_dir=a.model_save_dir,
            result_dir=a.result_dir, log_dir=a.log_dir, remat=a.remat)
        cfg.data = dataclasses.replace(
            cfg.data, data_dir=a.data_dir, test_dir=a.test_dir,
            diffuse_dir=a.diffuse_dir, est_diffuse=a.est_diffuse, flip=a.flip,
            use_psd_naming=a.psd_naming)
        cfg.mesh = dataclasses.replace(
            cfg.mesh, data_parallel=a.data_parallel, model_parallel=a.model_parallel)
        cfg.eval = dataclasses.replace(
            cfg.eval, calc_metrics=a.calc_metrics,
            specseg_weights=a.specseg_weights, use_ema=a.use_ema,
            native_resolution=a.native_resolution, mask_tta=a.mask_tta,
            mask_chroma_prior=a.mask_chroma_prior,
            export_dtype=a.export_dtype,
            checkpoint_step=a.checkpoint_step)
        cfg.serve = dataclasses.replace(
            cfg.serve, host=a.serve_host, port=a.serve_port,
            batch_size=a.serve_batch_size, watch_dir=a.serve_watch_dir,
            weights_bundle=a.serve_weights_bundle,
            batch_window_ms=a.serve_batch_window_ms,
            warm_sizes=tuple(
                s.strip() if s.strip() == "native" else int(s)
                for s in a.serve_warm_sizes.split(",") if s.strip()))
        return cfg

    def describe(self) -> str:
        """Option dump mirroring main.py:89-92."""
        lines = ["------------ Options -------------"]
        for section in ("model", "train", "data", "mesh", "eval"):
            for f in dataclasses.fields(getattr(self, section)):
                lines.append(f"{section}.{f.name}: {getattr(getattr(self, section), f.name)}")
        lines.append(f"mode: {self.mode}")
        lines.append("-------------- End ----------------")
        return "\n".join(lines)


def _strtobool(x) -> bool:
    if isinstance(x, bool):
        return x
    return str(x).strip().lower() in ("1", "true", "yes", "y", "t")
