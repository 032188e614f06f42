"""DIAMOND (parity: srl/algorithms/diamond/ — "DIffusion As a Model Of eNvironment
Dreams": an EDM-style conditional diffusion model IS the world model. Three nets:

* Denoiser  (model_denoiser.py / model_unet.py): a UNet with AdaGroupNorm
  conditioning on (Fourier noise embedding + recent-action embeddings), trained with
  the EDM preconditioning (c_skip/c_out/c_in/c_noise) and log-normal sigma sampling
  to denoise the next frame given the last C observed frames stacked channel-wise.
* RewardEndModel (model_reward_end.py): conv encoder over (obs, next_obs) pairs
  conditioned on the action, then an LSTM; categorical reward {-1,0,+1} and done
  {no,yes} heads (rewards are sign-clipped like the reference worker, worker.py:52-58).
* ActorCritic (model_actor_critic.py): small conv tower + LSTM + zero-init policy /
  value heads, trained purely inside imagination: rollouts through the diffusion
  sampler + reward/end model with lambda-returns (trainer.py _compute_actor_critic_loss).

The frame sampler (model_sampler.py) integrates the EDM probability-flow ODE over a
Karras sigma schedule (Euler or Heun, optional stochastic churn).

TPU re-design (not a port):
* The sigma schedule is STATIC — precomputed at trace time and scanned with
  `lax.scan`, so the whole imagination rollout (horizon x denoise-steps UNet calls)
  is one fused XLA program with fixed shapes; every UNet call is a full [B] batch on
  the MXU.
* The actor's LSTM state is engine-threaded per env (has_actor_state) exactly like
  R2D2/DreamerV3; acting never touches the diffusion model (reference worker.policy
  only runs actor_critic).
* Sequences are stored as fixed-length [L] windows per env per engine chunk
  (needs_step_view), replacing the reference's EpisodeReplayBuffer suffix sampling
  (memory.py): each of the three losses slices its own view of the shared window.
  Windows that cross an episode boundary are masked out of the diffusion/AC losses
  (the reference instead pads episodes with `horizon` repeats of the final frame,
  worker.py:70-80 — a different approximation of the same boundary problem).
* Terminal transitions keep the (post-reset) next frame as the reward/end input so
  the done head still sees positive examples; reward/done are driven by (obs, act).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..define import RLBaseTypes, SpaceTypes
from ..memories.replay_buffer import ReplayBuffer
from ..processors import Processor
from ..spaces import Box
from ..utils import rl_functions as funcs
from .base import AlgoConfig, StepView
from .common import masked_update

Array = jax.Array


# ---------------------------------------------------------------------------
# observation pipeline: resize + scale to [-1, 1] (parity: ImageProcessor with
# normalize_type="-1to1", diamond/config.py get_processors)
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class _DiamondImageProcessor(Processor):
    resize: Tuple[int, int] = (64, 64)
    grayscale: bool = False

    def remap_space(self, space: Box) -> Box:
        assert isinstance(space, Box) and space.stype.is_image(), (
            f"DIAMOND is image-only (reference asserts is_image_like, "
            f"diamond/config.py:146); got {space}"
        )
        self._low = float(jnp.min(jnp.asarray(space.low)))
        self._high = float(jnp.max(jnp.asarray(space.high)))
        h, w = self.resize
        c = 1 if self.grayscale else (space.shape[-1] if len(space.shape) == 3 else 1)
        stype = SpaceTypes.GRAY_3ch if c == 1 else (
            SpaceTypes.COLOR if c == 3 else SpaceTypes.FEATURE_MAP)
        return Box((h, w, c), -1.0, 1.0, jnp.float32, stype)

    def remap(self, x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 2:
            x = x[..., None]
        if self.grayscale and x.shape[-1] == 3:
            x = jnp.sum(x * jnp.asarray([0.299, 0.587, 0.114]), -1, keepdims=True)
        h, w = self.resize
        x = jax.image.resize(x, (h, w, x.shape[-1]), method="bilinear")
        return (2.0 * (x - self._low) / (self._high - self._low) - 1.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# sub-configs (parity: diamond/config.py:19-76)
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class DenoiserConfig:
    num_steps_conditioning: int = 4
    condition_channels: int = 256
    channels_list: Tuple[int, ...] = (64, 64, 64, 64)
    res_block_num_list: Tuple[int, ...] = (2, 2, 2, 2)
    use_attention_list: Tuple[bool, ...] = (False, False, False, False)
    # edm
    noise_mean: float = -0.4
    noise_std: float = 1.2
    sigma_min: float = 2e-3
    sigma_max: float = 20.0
    sigma_offset_noise: float = 0.3
    sigma_data: float = 0.5
    # train
    lr: float = 1e-4
    weight_decay: float = 1e-2
    eps: float = 1e-8
    max_grad_norm: float = 1.0


@dataclasses.dataclass
class DiffusionSamplerConfig:
    num_steps_denoising: int = 3
    sigma_min: float = 2e-3
    sigma_max: float = 5.0
    rho: int = 7
    order: int = 1  # 1=Euler, 2=Heun
    s_churn: float = 0.0
    s_min: float = 0.0
    s_max: float = float("inf")
    s_noise: float = 1.0


@dataclasses.dataclass
class RewardEndModelConfig:
    lstm_dim: int = 512
    condition_channels: int = 128
    channels_list: Tuple[int, ...] = (32, 32, 32, 32)
    res_block_num_list: Tuple[int, ...] = (2, 2, 2, 2)
    use_attention_list: Tuple[bool, ...] = (False, False, False, False)
    lr: float = 1e-4
    weight_decay: float = 1e-2
    eps: float = 1e-8
    max_grad_norm: float = 100.0


@dataclasses.dataclass
class ActorCriticConfig:
    lstm_dim: int = 512
    channels_list: Tuple[int, ...] = (32, 32, 64, 64)
    enable_downsampling_list: Tuple[bool, ...] = (True, True, True, True)
    lr: float = 1e-4
    weight_decay: float = 0.0
    eps: float = 1e-8
    max_grad_norm: float = 100.0


# ---------------------------------------------------------------------------
# building blocks (parity: diamond/model_unet.py)
# ---------------------------------------------------------------------------
def _group_norm(ch: int) -> nn.Module:
    groups = 32 if ch % 32 == 0 else (8 if ch % 8 == 0 else 1)
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5)


def _fourier_features(x: Array, dim: int) -> Array:
    """Fixed random Fourier projection of the (log-)noise level. The reference keeps
    a frozen random weight (model_denoiser.py FourierFeatures, trainable=False); a
    trace-time constant is the functional equivalent."""
    w = jax.random.normal(jax.random.PRNGKey(71), (1, dim // 2))
    f = 2.0 * math.pi * x.reshape(-1, 1) @ w
    return jnp.concatenate([jnp.cos(f), jnp.sin(f)], -1)


class AdaGroupNorm(nn.Module):
    """GroupNorm whose scale/shift come from the condition vector (zero-init)."""

    @nn.compact
    def __call__(self, x, cond):
        ch = x.shape[-1]
        x = _group_norm(ch)(x)
        gamma = nn.Dense(ch, use_bias=False, kernel_init=nn.initializers.zeros)(cond)
        beta = nn.Dense(ch, use_bias=False, kernel_init=nn.initializers.zeros)(cond)
        return x * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]


class SelfAttention2D(nn.Module):
    head_dim: int = 8

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n_head = max(1, c // self.head_dim)
        y = _group_norm(c)(x)
        qkv = nn.Conv(c * 3, (1, 1))(y).reshape(b, h * w, n_head, 3 * (c // n_head))
        q, k, v = jnp.split(jnp.swapaxes(qkv, 1, 2), 3, axis=-1)  # [b, nh, hw, hd]
        attn = jax.nn.softmax(q @ jnp.swapaxes(k, -1, -2) / jnp.sqrt(k.shape[-1]), -1)
        y = jnp.swapaxes(attn @ v, 1, 2).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros)(y)
        return x + out


class CondResBlock(nn.Module):
    out_ch: int
    use_attention: bool = False

    @nn.compact
    def __call__(self, x, cond):
        skip = x if x.shape[-1] == self.out_ch else nn.Conv(self.out_ch, (1, 1))(x)
        y = nn.silu(AdaGroupNorm()(x, cond))
        y = nn.Conv(self.out_ch, (3, 3))(y)
        y = nn.silu(AdaGroupNorm()(y, cond))
        y = nn.Conv(self.out_ch, (3, 3), kernel_init=nn.initializers.zeros)(y)
        y = skip + y
        if self.use_attention:
            y = SelfAttention2D()(y)
        return y


class UNet(nn.Module):
    """Conditioned UNet over [B,H,W,C]; H,W must be divisible by 2**(levels-1)."""

    channels: Tuple[int, ...]
    nblocks: Tuple[int, ...]
    attn: Tuple[bool, ...]

    @nn.compact
    def __call__(self, x, cond):
        skips = []
        for i, ch in enumerate(self.channels):
            if i > 0:  # strided-conv downsample between levels
                x = nn.Conv(x.shape[-1], (3, 3), strides=2,
                            kernel_init=nn.initializers.orthogonal())(x)
            for _ in range(self.nblocks[i]):
                x = CondResBlock(ch, self.attn[i])(x, cond)
                skips.append(x)
        # mid
        x = CondResBlock(self.channels[-1], True)(x, cond)
        x = CondResBlock(self.channels[-1], True)(x, cond)
        # up path with skip concats
        for i in reversed(range(len(self.channels))):
            for _ in range(self.nblocks[i]):
                x = jnp.concatenate([x, skips.pop()], -1)
                x = CondResBlock(self.channels[i], self.attn[i])(x, cond)
            if i > 0:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
                x = nn.Conv(c, (3, 3))(x)
        return x


class DenoiserNet(nn.Module):
    """Raw network F(.) inside the EDM preconditioning (model_denoiser.py call)."""

    img_ch: int
    num_actions: int
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, noisy, c_noise, recent_obs, recent_act):
        cc = self.cfg.condition_channels
        # condition vector: Fourier(noise) ++ flattened action embeddings
        noise_emb = _fourier_features(c_noise, cc)
        act_emb = nn.Embed(self.num_actions, cc)(recent_act)  # [B, C, cc]
        cond = jnp.concatenate([noise_emb, act_emb.reshape(act_emb.shape[0], -1)], -1)
        cond = nn.Dense(cc)(nn.silu(nn.Dense(cc)(cond)))
        # recent frames stacked channel-wise: [B,C,H,W,ch] -> [B,H,W,ch*C]
        b, t, h, w, ch = recent_obs.shape
        frames = jnp.moveaxis(recent_obs, 1, -1).reshape(b, h, w, ch * t)
        x = jnp.concatenate([noisy, frames], -1)
        x = nn.Conv(self.cfg.channels_list[0], (3, 3))(x)
        x = UNet(self.cfg.channels_list, self.cfg.res_block_num_list,
                 self.cfg.use_attention_list)(x, cond)
        x = nn.silu(_group_norm(x.shape[-1])(x))
        return nn.Conv(self.img_ch, (3, 3), kernel_init=nn.initializers.zeros)(x)


class RewardEndNet(nn.Module):
    """(obs, act, next_obs) -> conv feat -> LSTM -> reward{3}/done{2} logits."""

    num_actions: int
    cfg: RewardEndModelConfig

    def setup(self):
        cfg = self.cfg
        self.act_emb = nn.Embed(self.num_actions, cfg.condition_channels)
        self.conv_in = nn.Conv(cfg.channels_list[0], (3, 3))
        self.blocks = [
            [CondResBlock(cfg.channels_list[i], cfg.use_attention_list[i])
             for _ in range(cfg.res_block_num_list[i])]
            for i in range(len(cfg.channels_list))
        ]
        self.downs = [
            (None if i == 0 else nn.Conv(cfg.channels_list[i - 1], (3, 3), strides=2,
                                         kernel_init=nn.initializers.orthogonal()))
            for i in range(len(cfg.channels_list))
        ]
        self.final_blocks = [CondResBlock(cfg.channels_list[-1], True) for _ in range(2)]
        self.cell = nn.OptimizedLSTMCell(cfg.lstm_dim)
        self.mid = nn.Dense(cfg.lstm_dim)
        self.reward_head = nn.Dense(3, use_bias=False)
        self.done_head = nn.Dense(2, use_bias=False)

    def encode(self, obs, act, next_obs):
        cond = self.act_emb(act)
        x = self.conv_in(jnp.concatenate([obs, next_obs], -1))
        for down, blocks in zip(self.downs, self.blocks):
            if down is not None:
                x = down(x)
            for blk in blocks:
                x = blk(x, cond)
        for blk in self.final_blocks:
            x = blk(x, cond)
        return x.reshape(x.shape[0], -1)

    def step(self, hc, feat):
        hc, y = self.cell(hc, feat)
        y = nn.silu(self.mid(y))
        return hc, (self.reward_head(y), self.done_head(y))

    def __call__(self, obs, act, next_obs, hc):
        # single-step (used for init shapes)
        feat = self.encode(obs, act, next_obs)
        hc, (r, d) = self.step(hc, feat)
        return r, d, hc


class ActorCriticNet(nn.Module):
    num_actions: int
    cfg: ActorCriticConfig

    def setup(self):
        cfg = self.cfg
        layers = [nn.Conv(cfg.channels_list[0], (3, 3))]
        for i, ch in enumerate(cfg.channels_list):
            layers.append(_ACResBlock(ch, pool=cfg.enable_downsampling_list[i]))
        self.encoder = layers
        self.cell = nn.OptimizedLSTMCell(cfg.lstm_dim)
        self.actor_head = nn.Dense(self.num_actions, kernel_init=nn.initializers.zeros,
                                   bias_init=nn.initializers.zeros)
        self.critic_head = nn.Dense(1, kernel_init=nn.initializers.zeros,
                                    bias_init=nn.initializers.zeros)

    def encode(self, obs):
        x = obs
        for layer in self.encoder:
            x = layer(x)
        return x.reshape(x.shape[0], -1)

    def step(self, hc, feat):
        hc, y = self.cell(hc, feat)
        return hc, (self.actor_head(y), self.critic_head(y)[..., 0])

    def __call__(self, obs, hc):
        feat = self.encode(obs)
        hc, (a, v) = self.step(hc, feat)
        return a, v, hc


class _ACResBlock(nn.Module):
    out_ch: int
    pool: bool

    @nn.compact
    def __call__(self, x):
        skip = x if x.shape[-1] == self.out_ch else nn.Conv(self.out_ch, (1, 1))(x)
        y = nn.Conv(self.out_ch, (3, 3))(nn.silu(_group_norm(x.shape[-1])(x)))
        y = skip + y
        if self.pool:
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        return y


# ---------------------------------------------------------------------------
# engine state containers
# ---------------------------------------------------------------------------
@struct.dataclass
class DiamondActorState:
    c: Array  # [B, lstm]
    h: Array


@struct.dataclass
class DiamondSeq:
    obs: Any  # [L, H, W, ch] in [-1, 1]
    action: Array  # [L]
    reward: Array  # [L]
    terminated: Array  # [L]
    is_first: Array  # [L]


@struct.dataclass
class DiamondState:
    diff_params: Any
    re_params: Any
    ac_params: Any
    diff_opt: Any
    re_opt: Any
    ac_opt: Any
    memory: Any
    train_count: Array


# ---------------------------------------------------------------------------
# config / algorithm
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class DiamondConfig(AlgoConfig):
    """Parity: diamond/config.py Config."""

    denoiser_cfg: DenoiserConfig = dataclasses.field(default_factory=DenoiserConfig)
    sampler_cfg: DiffusionSamplerConfig = dataclasses.field(default_factory=DiffusionSamplerConfig)
    reward_end_cfg: RewardEndModelConfig = dataclasses.field(default_factory=RewardEndModelConfig)
    actor_critic_cfg: ActorCriticConfig = dataclasses.field(default_factory=ActorCriticConfig)

    train_diffusion: bool = True
    train_reward_end: bool = True
    train_actor_critic: bool = True
    #: rematerialize the imagination scan body (jax.checkpoint): the backward
    #: pass re-runs each step's denoise-chain UNet calls instead of keeping
    #: their activations live across the whole horizon. At the reference's
    #: default Atari scale (64x64, UNet ch 64x4, horizon 15, batch 32) the
    #: stored activations of the ~45-UNet-call scan exceed one 16 GB chip;
    #: remat trades ~1 extra forward for fitting it. Off by default — at the
    #: small test-recipe scale the recompute only costs time.
    remat_imagination: bool = False

    batch_size: int = 32
    capacity: int = 2_000  # stored [L]-windows
    warmup_size: int = 50
    burnin: int = 4
    horizon: int = 15
    discount: float = 0.985
    lambda_: float = 0.95
    weight_entropy_loss: float = 0.001
    weight_value_loss: float = 1.0
    img_shape: Tuple[int, int] = (64, 64)
    img_color: bool = True

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE
    has_actor_state: bool = True
    needs_step_view: bool = True

    def get_name(self) -> str:
        return "DIAMOND"

    def set_small_params(self):
        """Parity: config.set_small_params — shrunk for fast iteration; further
        shrunk here to fit unit-test compile budgets."""
        self.img_shape = (16, 16)
        self.denoiser_cfg = DenoiserConfig(
            num_steps_conditioning=2, condition_channels=32,
            channels_list=(16, 16), res_block_num_list=(1, 1),
            use_attention_list=(False, False))
        self.reward_end_cfg = RewardEndModelConfig(
            lstm_dim=16, condition_channels=16, channels_list=(8, 8),
            res_block_num_list=(1, 1), use_attention_list=(False, False))
        self.actor_critic_cfg = ActorCriticConfig(
            lstm_dim=16, channels_list=(8, 8),
            enable_downsampling_list=(True, True))
        self.sampler_cfg = DiffusionSamplerConfig(num_steps_denoising=2)
        self.batch_size = 8
        self.burnin = 1
        self.horizon = 3
        self.capacity = 2_000
        self.warmup_size = 20
        return self

    def get_processors(self, obs_space) -> list:
        return [_DiamondImageProcessor(resize=self.img_shape, grayscale=not self.img_color)]

    # --- static setup ------------------------------------------------------
    @property
    def required_chunk_steps(self) -> int:
        return self.batch_length

    def on_setup(self) -> None:
        self.A = self.action_space.n
        C = self.denoiser_cfg.num_steps_conditioning
        assert C >= 1 and self.burnin >= 0 and self.horizon >= 1
        self.batch_length = max(self.burnin + self.horizon, C) + 1
        h, w = self.img_shape
        levels = len(self.denoiser_cfg.channels_list)
        assert h % (2 ** (levels - 1)) == 0 and w % (2 ** (levels - 1)) == 0, (
            f"img_shape {self.img_shape} not divisible by UNet downsampling "
            f"2**{levels - 1}")
        self.img_ch = 1 if not self.img_color else (
            self.obs_space.shape[-1] if len(self.obs_space.shape) == 3 else 1)
        self.denoiser = DenoiserNet(self.img_ch, self.A, self.denoiser_cfg)
        self.reward_end = RewardEndNet(self.A, self.reward_end_cfg)
        self.actor_critic = ActorCriticNet(self.A, self.actor_critic_cfg)
        self._replay = ReplayBuffer(self.capacity, self.warmup_size)

        def tx(lr, wd, eps, clip):
            return optax.chain(optax.clip_by_global_norm(clip),
                               optax.adamw(lr, weight_decay=wd, eps=eps))

        d, r, a = self.denoiser_cfg, self.reward_end_cfg, self.actor_critic_cfg
        self._diff_tx = tx(d.lr, d.weight_decay, d.eps, d.max_grad_norm)
        self._re_tx = tx(r.lr, r.weight_decay, r.eps, r.max_grad_norm)
        self._ac_tx = tx(a.lr, a.weight_decay, a.eps, a.max_grad_norm)

    # --- EDM preconditioning (parity: model_denoiser.py denoise) -----------
    def _denoise(self, diff_params, noisy, sigma, recent_obs, recent_act):
        d = self.denoiser_cfg
        sigma = jnp.sqrt(sigma**2 + d.sigma_offset_noise**2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + d.sigma_data**2)
        c_skip = d.sigma_data**2 / (sigma**2 + d.sigma_data**2)
        c_out = sigma * jnp.sqrt(c_skip)
        c_noise = jnp.log(sigma.reshape(sigma.shape[0])) / 4.0
        out = self.denoiser.apply(
            diff_params, c_in * noisy, c_noise, recent_obs / d.sigma_data, recent_act)
        return c_skip * noisy + c_out * out

    # --- Karras sigma schedule (parity: model_sampler.py create_timesteps) --
    def _sampler_sigmas(self):
        s = self.sampler_cfg
        N = s.num_steps_denoising
        if N == 1:
            return [s.sigma_max, 0.0]
        lo, hi = s.sigma_min ** (1 / s.rho), s.sigma_max ** (1 / s.rho)
        return [(hi + i / (N - 1) * (lo - hi)) ** s.rho for i in range(N)] + [0.0]

    def _sample_frame(self, diff_params, key, recent_obs, recent_act,
                      return_trajectory: bool = False):
        """Integrate the EDM ODE to sample the next frame. Static schedule -> the
        per-step (sigma, sigma_next, gamma) triples are scanned constants."""
        s = self.sampler_cfg
        sigmas = self._sampler_sigmas()
        gamma_base = min(s.s_churn / s.num_steps_denoising, 2**0.5 - 1)
        b = recent_obs.shape[0]
        img_shape = recent_obs.shape[2:]
        k0, key = jax.random.split(key)
        x = jax.random.normal(k0, (b,) + img_shape) * sigmas[0]

        steps = []
        for sig, nsig in zip(sigmas[:-1], sigmas[1:]):
            gamma = gamma_base if s.s_min <= sig <= s.s_max else 0.0
            steps.append((sig, nsig, gamma))

        def one_step(x, inp):
            (sig, nsig, gamma), k = inp
            sigma_hat = sig * (gamma + 1.0)
            eps = jax.random.normal(k, x.shape) * s.s_noise
            x = x + eps * (sigma_hat**2 - sig**2) ** 0.5
            sh = jnp.full((b, 1, 1, 1), sigma_hat)
            den = self._denoise(diff_params, x, sh, recent_obs, recent_act)
            d_cur = (x - den) / sigma_hat
            dt = nsig - sigma_hat
            x_next = x + d_cur * dt
            if s.order >= 2 and nsig > 0:  # Heun correction (static branch)
                ns = jnp.full((b, 1, 1, 1), nsig)
                den2 = self._denoise(diff_params, x_next, ns, recent_obs, recent_act)
                d2 = (x_next - den2) / nsig
                x_next = x + dt * (d_cur + d2) / 2.0
            return x_next, x_next

        if return_trajectory:
            traj = [x]
            for st, k in zip(steps, jax.random.split(key, len(steps))):
                x, _ = one_step(x, (st, k))
                traj.append(x)
            return x, traj
        xs = (
            jnp.asarray([st[0] for st in steps]),
            jnp.asarray([st[1] for st in steps]),
            jnp.asarray([st[2] for st in steps]),
        )

        def scan_step(x, inp):
            (sig, nsig, gamma), k = inp
            sigma_hat = sig * (gamma + 1.0)
            eps = jax.random.normal(k, x.shape) * s.s_noise
            x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sig**2, 0.0))
            sh = jnp.broadcast_to(sigma_hat, (b,)).reshape(b, 1, 1, 1)
            den = self._denoise(diff_params, x, sh, recent_obs, recent_act)
            d_cur = (x - den) / sigma_hat
            x = x + d_cur * (nsig - sigma_hat)
            return x, None

        if s.order >= 2:
            # Heun needs the static-zero check on nsig -> python loop (still traced
            # once; num_steps_denoising is small and static)
            for st, k in zip(steps, jax.random.split(key, len(steps))):
                x, _ = one_step(x, (st, k))
            return x, None
        x, _ = jax.lax.scan(
            scan_step, x, ((xs[0], xs[1], xs[2]), jax.random.split(key, len(steps))))
        return x, None

    # --- init ---------------------------------------------------------------
    def _zeros_hc(self, dim, batch):
        return (jnp.zeros((batch, dim)), jnp.zeros((batch, dim)))

    def _example_seq(self) -> DiamondSeq:
        L = self.batch_length
        obs0 = self.obs_space.zero()
        return DiamondSeq(
            obs=jnp.zeros((L,) + obs0.shape, jnp.float32),
            action=jnp.zeros((L,), jnp.int32),
            reward=jnp.zeros((L,)),
            terminated=jnp.zeros((L,)),
            is_first=jnp.zeros((L,), bool),
        )

    def init(self, key: Array) -> DiamondState:
        k1, k2, k3 = jax.random.split(key, 3)
        C = self.denoiser_cfg.num_steps_conditioning
        obs0 = self.obs_space.zero()[None]
        ro = jnp.zeros((1, C) + obs0.shape[1:])
        ra = jnp.zeros((1, C), jnp.int32)
        diff_params = self.denoiser.init(k1, obs0, jnp.zeros((1,)), ro, ra)
        re_params = self.reward_end.init(
            k2, obs0, jnp.zeros((1,), jnp.int32), obs0,
            self._zeros_hc(self.reward_end_cfg.lstm_dim, 1))
        ac_params = self.actor_critic.init(
            k3, obs0, self._zeros_hc(self.actor_critic_cfg.lstm_dim, 1))
        return DiamondState(
            diff_params=diff_params,
            re_params=re_params,
            ac_params=ac_params,
            diff_opt=self._diff_tx.init(diff_params),
            re_opt=self._re_tx.init(re_params),
            ac_opt=self._ac_tx.init(ac_params),
            memory=self._replay.init(self._example_seq()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    # --- acting (parity: worker.policy — actor_critic only) -----------------
    def init_actor_state(self, key, num_envs) -> DiamondActorState:
        dim = self.actor_critic_cfg.lstm_dim
        return DiamondActorState(c=jnp.zeros((num_envs, dim)), h=jnp.zeros((num_envs, dim)))

    def actor_snapshot(self, actor):
        return None

    def policy_step(self, state: DiamondState, actor, obs, invalid_mask, ctx, key,
                    episode_start):
        m = episode_start[:, None].astype(jnp.float32)
        hc = (actor.c * (1 - m), actor.h * (1 - m))
        a_logits, _v, hc = self.actor_critic.apply(
            state.ac_params, jnp.asarray(obs, jnp.float32), hc)
        a_logits = jnp.where(invalid_mask, -jnp.inf, a_logits)
        # the reference SAMPLES the categorical policy in eval too (worker.py:43
        # has no training branch) — argmax eval was stricter than the capability
        # being matched
        action = jax.random.categorical(key, a_logits, -1).astype(jnp.int32)
        return action, DiamondActorState(c=hc[0], h=hc[1])

    # --- memory --------------------------------------------------------------
    def observe_chunk(self, state: DiamondState, transitions, mask, sv: StepView) -> DiamondState:
        items = DiamondSeq(
            obs=jnp.moveaxis(jnp.asarray(sv.obs, jnp.float32), 0, 1),
            action=jnp.moveaxis(sv.action, 0, 1),
            reward=jnp.moveaxis(sv.reward, 0, 1),
            terminated=jnp.moveaxis(sv.terminated.astype(jnp.float32), 0, 1),
            is_first=jnp.moveaxis(sv.episode_start, 0, 1),
        )
        return state.replace(memory=self._replay.add(state.memory, items))

    # --- losses ---------------------------------------------------------------
    def _diff_loss(self, diff_params, batch: DiamondSeq, key):
        """EDM denoising loss on frame C given frames [0..C-1] and the actions
        between them (parity: Denoiser.update, model_denoiser.py:103-126)."""
        d = self.denoiser_cfg
        C = d.num_steps_conditioning
        obs = jnp.asarray(batch.obs, jnp.float32)
        target = obs[:, C]
        recent_obs = obs[:, :C]
        recent_act = batch.action[:, :C]
        B = target.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        sigma = jnp.exp(d.noise_mean + d.noise_std * jax.random.normal(k1, (B, 1, 1, 1)))
        noisy = (target
                 + d.sigma_offset_noise * jax.random.normal(k2, target.shape)
                 + jax.random.normal(k3, target.shape) * sigma)
        weight = (sigma**2 + d.sigma_data**2) / (sigma * d.sigma_data) ** 2
        den = self._denoise(diff_params, noisy, sigma, recent_obs, recent_act)
        per = weight[..., 0, 0, 0] * jnp.mean(funcs.huber(den - target), (1, 2, 3))
        # windows whose conditioning crosses an episode boundary are invalid
        valid = ~jnp.any(batch.is_first[:, 1:C + 1], -1)
        return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    def _re_scan(self, re_params, obs, act, next_obs, is_first, hc):
        """Unroll the reward/end LSTM over [B, T] transitions, resetting the hidden
        at episode starts. Returns per-step (r_logits, d_logits)."""
        B, T = act.shape
        feats = self.reward_end.apply(
            re_params,
            obs.reshape((B * T,) + obs.shape[2:]),
            act.reshape(B * T),
            next_obs.reshape((B * T,) + obs.shape[2:]),
            method=RewardEndNet.encode,
        ).reshape(B, T, -1)

        def step(hc, x):
            feat, first = x
            m = first[:, None].astype(jnp.float32)
            hc = (hc[0] * (1 - m), hc[1] * (1 - m))
            hc, out = self.reward_end.apply(re_params, hc, feat, method=RewardEndNet.step)
            return hc, out

        hc, (r, dlog) = jax.lax.scan(
            step, hc, (jnp.moveaxis(feats, 0, 1), jnp.moveaxis(is_first, 0, 1)))
        return jnp.moveaxis(r, 0, 1), jnp.moveaxis(dlog, 0, 1), hc

    def _re_loss(self, re_params, batch: DiamondSeq, key):
        """Categorical reward {-1,0,+1} + done CE over the window's transitions after
        `burnin` warmup steps (parity: trainer._update_reward_end)."""
        obs = jnp.asarray(batch.obs, jnp.float32)
        B, L = batch.action.shape
        T = L - 1
        r_logits, d_logits, _ = self._re_scan(
            re_params, obs[:, :-1], batch.action[:, :-1], obs[:, 1:],
            batch.is_first[:, :-1], self._zeros_hc(self.reward_end_cfg.lstm_dim, B))
        rew = batch.reward[:, :T]
        r_target = jax.nn.one_hot(jnp.sign(rew).astype(jnp.int32) + 1, 3)
        d_target = jax.nn.one_hot(batch.terminated[:, :T].astype(jnp.int32), 2)
        ce_r = -jnp.sum(r_target * jax.nn.log_softmax(r_logits, -1), -1)
        ce_d = -jnp.sum(d_target * jax.nn.log_softmax(d_logits, -1), -1)
        # skip burnin steps; mask transitions that jump into a new episode unless
        # they are the terminal transition itself (done positive example)
        step_ix = jnp.arange(T)[None, :]
        valid = (step_ix >= self.burnin).astype(jnp.float32)
        valid = valid * jnp.where(
            batch.is_first[:, 1:], batch.terminated[:, :T], 1.0)
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        loss_r = jnp.sum(ce_r * valid) / denom
        loss_d = jnp.sum(ce_d * valid) / denom
        return loss_r + loss_d, (loss_r, loss_d)

    def _ac_loss(self, ac_params, diff_params, re_params, batch: DiamondSeq, key):
        """Imagination actor-critic: burn in both LSTMs on the real window, then roll
        `horizon` steps through the diffusion sampler + reward/end model and train on
        lambda-returns (parity: trainer._compute_actor_critic_loss, with the proper
        v_{t+1} bootstrap instead of the reference's v_t)."""
        C = self.denoiser_cfg.num_steps_conditioning
        H = self.horizon
        obs = jnp.asarray(batch.obs, jnp.float32)
        B = obs.shape[0]
        recent_obs = obs[:, :C]  # [B, C, ...]
        act_prefix = batch.action[:, :C - 1] if C > 1 else jnp.zeros((B, 0), jnp.int32)

        # burn in reward/end LSTM on the window's real transitions
        hc_re = self._zeros_hc(self.reward_end_cfg.lstm_dim, B)
        if C > 1:
            _, _, hc_re = self._re_scan(
                re_params, obs[:, :C - 1], batch.action[:, :C - 1], obs[:, 1:C],
                batch.is_first[:, :C - 1], hc_re)
        # burn in actor-critic LSTM on frames 0..C-2
        hc_ac = self._zeros_hc(self.actor_critic_cfg.lstm_dim, B)
        for i in range(C - 1):
            _, _, hc_ac = self.actor_critic.apply(ac_params, obs[:, i], hc_ac)
        hc_re = jax.lax.stop_gradient(hc_re)

        def imagine_step(carry, k):
            ro, ra_prefix, hc_ac, hc_re = carry
            k1, k2 = jax.random.split(k)
            frame = ro[:, -1]
            a_logits, v, hc_ac = self.actor_critic.apply(ac_params, frame, hc_ac)
            a = jax.random.categorical(k1, a_logits, -1).astype(jnp.int32)
            lp = jax.nn.log_softmax(a_logits, -1)
            logpi = jnp.take_along_axis(lp, a[:, None], -1)[:, 0]
            entropy = -jnp.sum(jnp.exp(lp) * lp, -1)
            ra = jnp.concatenate([ra_prefix, a[:, None]], 1)  # [B, C]
            nxt, _ = self._sample_frame(diff_params, k2, ro, ra)
            nxt = jax.lax.stop_gradient(nxt)
            feat = self.reward_end.apply(
                re_params, frame, a, nxt, method=RewardEndNet.encode)
            hc_re, (r3, d2) = self.reward_end.apply(
                re_params, hc_re, feat, method=RewardEndNet.step)
            r = jnp.sum(jax.nn.softmax(r3, -1) * jnp.asarray([-1.0, 0.0, 1.0]), -1)
            done = jax.nn.softmax(d2, -1)[:, 1]
            ro = jnp.concatenate([ro[:, 1:], nxt[:, None]], 1)
            ra_prefix = ra[:, 1:]
            return (ro, ra_prefix, hc_ac, hc_re), (v, logpi, entropy, r, done)

        carry = (recent_obs, act_prefix, hc_ac, hc_re)
        step_fn = jax.checkpoint(imagine_step) if self.remat_imagination else imagine_step
        (ro, ra_prefix, hc_ac, _), (vs, logpis, ents, rs, ds) = jax.lax.scan(
            step_fn, carry, jax.random.split(key, H))
        # bootstrap value at the final imagined frame
        _, v_last, _ = self.actor_critic.apply(ac_params, ro[:, -1], hc_ac)

        disc = self.discount * (1.0 - jax.lax.stop_gradient(ds))
        v_next = jnp.concatenate([vs[1:], v_last[None]], 0)

        def back(G, x):
            r, d, vn = x
            G = r + d * ((1 - self.lambda_) * vn + self.lambda_ * G)
            return G, G

        _, Gs = jax.lax.scan(
            back, v_last,
            (jax.lax.stop_gradient(rs[::-1]), disc[::-1],
             jax.lax.stop_gradient(v_next[::-1])))
        returns = jax.lax.stop_gradient(Gs[::-1])  # [H, B]

        # mask imagination rows whose conditioning window crossed a boundary
        valid = (~jnp.any(batch.is_first[:, 1:C], -1)).astype(jnp.float32)[None, :] \
            if C > 1 else jnp.ones((1, B))
        denom = jnp.maximum(jnp.sum(valid) * H, 1.0)
        adv = returns - jax.lax.stop_gradient(vs)
        loss_a = -jnp.sum(valid * logpis * adv) / denom
        loss_v = jnp.sum(valid * funcs.huber(vs - returns)) / denom
        loss_e = -jnp.sum(valid * ents) / denom
        loss = (loss_a + self.weight_value_loss * loss_v
                + self.weight_entropy_loss * loss_e)
        return loss, (loss_a, loss_v, loss_e)

    # --- train -------------------------------------------------------------
    def train(self, state: DiamondState, key: Array, num_steps: int
              ) -> Tuple[DiamondState, Dict[str, Array]]:
        def one_update(st: DiamondState, k):
            ks = jax.random.split(k, 6)
            info = {}

            diff_params, diff_opt = st.diff_params, st.diff_opt
            if self.train_diffusion:
                batch, _ = self._replay.sample_with_indices(st.memory, ks[0], self.batch_size)
                dl, grads = jax.value_and_grad(self._diff_loss)(st.diff_params, batch, ks[1])
                if self.pmean_axis is not None:
                    grads = self.dp_pmean(grads)
                up, diff_opt = self._diff_tx.update(grads, st.diff_opt, st.diff_params)
                diff_params = optax.apply_updates(st.diff_params, up)
                info["loss_diff"] = dl

            re_params, re_opt = st.re_params, st.re_opt
            if self.train_reward_end:
                batch, _ = self._replay.sample_with_indices(st.memory, ks[2], self.batch_size)
                (rl, (lr_, ld_)), grads = jax.value_and_grad(self._re_loss, has_aux=True)(
                    st.re_params, batch, ks[3])
                if self.pmean_axis is not None:
                    grads = self.dp_pmean(grads)
                up, re_opt = self._re_tx.update(grads, st.re_opt, st.re_params)
                re_params = optax.apply_updates(st.re_params, up)
                info["loss_r"] = lr_
                info["loss_d"] = ld_

            ac_params, ac_opt = st.ac_params, st.ac_opt
            if self.train_actor_critic:
                batch, _ = self._replay.sample_with_indices(st.memory, ks[4], self.batch_size)
                (al, (la, lv, le)), grads = jax.value_and_grad(self._ac_loss, has_aux=True)(
                    st.ac_params, diff_params, re_params, batch, ks[5])
                if self.pmean_axis is not None:
                    grads = self.dp_pmean(grads)
                up, ac_opt = self._ac_tx.update(grads, st.ac_opt, st.ac_params)
                ac_params = optax.apply_updates(st.ac_params, up)
                info["loss_a"] = la
                info["loss_v"] = lv
                info["loss_entropy"] = le

            ready = self._replay.is_warmup_over(st.memory)
            new = st.replace(
                diff_params=masked_update(ready, diff_params, st.diff_params),
                re_params=masked_update(ready, re_params, st.re_params),
                ac_params=masked_update(ready, ac_params, st.ac_params),
                diff_opt=masked_update(ready, diff_opt, st.diff_opt),
                re_opt=masked_update(ready, re_opt, st.re_opt),
                ac_opt=masked_update(ready, ac_opt, st.ac_opt),
                train_count=st.train_count + ready.astype(jnp.int32),
            )
            return new, info

        state, infos = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        out = {k: jnp.mean(v) for k, v in infos.items()}
        out["train_count"] = state.train_count.astype(jnp.float32)
        return state, out

    # --- imagination inspection (parity: worker.render_rgb_array's next-frame
    # panel, decoded via config.decode_img) ----------------------------------
    def imagine_next_frames(self, state: DiamondState, recent_obs, recent_act, key):
        """Sample next frames for every action from the latest C frames; returns
        ([A, H, W, ch] frames in [-1,1], reward[A], done_prob[A])."""
        A = self.A
        ro = jnp.repeat(jnp.asarray(recent_obs, jnp.float32)[None], A, 0)
        acts = jnp.arange(A, dtype=jnp.int32)
        ra = jnp.concatenate(
            [jnp.repeat(jnp.asarray(recent_act, jnp.int32)[None, 1:], A, 0),
             acts[:, None]], 1) if self.denoiser_cfg.num_steps_conditioning > 1 \
            else acts[:, None]
        nxt, _ = self._sample_frame(state.diff_params, key, ro, ra)
        feat = self.reward_end.apply(
            state.re_params, ro[:, -1], acts, nxt, method=RewardEndNet.encode)
        _, (r3, d2) = self.reward_end.apply(
            state.re_params, self._zeros_hc(self.reward_end_cfg.lstm_dim, A), feat,
            method=RewardEndNet.step)
        r = jnp.sum(jax.nn.softmax(r3, -1) * jnp.asarray([-1.0, 0.0, 1.0]), -1)
        return nxt, r, jax.nn.softmax(d2, -1)[:, 1]

    @staticmethod
    def decode_img(img, low=-1.0, high=1.0):
        """[-1,1] float frame -> uint8 (parity: config.decode_img)."""
        import numpy as np

        img = np.clip(np.asarray(img), low, high)
        return (((img - low) / (high - low)) * 255).astype("uint8")

    # --- checkpoint ----------------------------------------------------------
    def params_of(self, state: DiamondState):
        return {"diff": state.diff_params, "re": state.re_params, "ac": state.ac_params}

    def restore_params(self, state: DiamondState, p) -> DiamondState:
        return state.replace(diff_params=p["diff"], re_params=p["re"], ac_params=p["ac"])
