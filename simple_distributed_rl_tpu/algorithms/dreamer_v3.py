"""DreamerV3 (parity: srl/algorithms/dreamer_v3/ — RSSM world model with categorical
stochastic latents, symlog/twohot reward+value heads, KL balancing with free bits,
actor-critic trained on imagined rollouts with lambda-returns and percentile return
normalization).

TPU re-design: the actor's recurrent (h, z) state is engine-threaded per env (like
R2D2); each engine chunk yields one stored sequence per env; world-model training
unrolls the RSSM with lax.scan over [batch, L] sequences; imagination rolls the prior
forward H steps from every posterior state simultaneously (batch*L imagination
starts — one big MXU batch, no python loops anywhere).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..define import RLBaseTypes
from ..memories.replay_buffer import ReplayBuffer
from ..models.blocks import InputBlockConfig, MLPBlock
from ..utils import rl_functions as funcs
from .base import AlgoConfig, StepView
from .common import masked_update

Array = jax.Array


def _unimix(logits, mix=0.01):
    """1% uniform mixture on categorical latents (dreamerv3)."""
    probs = jax.nn.softmax(logits, -1)
    probs = (1 - mix) * probs + mix / logits.shape[-1]
    return jnp.log(probs)


class RSSM(nn.Module):
    deter: int
    stoch: int  # number of categorical variables
    classes: int  # classes per variable
    obs_space: Any
    input_block: InputBlockConfig

    def setup(self):
        self.embed_in = self.input_block.create_block(self.obs_space)
        self.embed_mlp = MLPBlock((256,))
        self.gru = nn.GRUCell(self.deter)
        self.prior_net = nn.Sequential([MLPBlock((256,)), nn.Dense(self.stoch * self.classes)])
        self.post_net = nn.Sequential([MLPBlock((256,)), nn.Dense(self.stoch * self.classes)])
        self.in_proj = nn.Dense(256)

    def embed(self, obs):
        return self.embed_mlp(self.embed_in(jnp.asarray(obs, jnp.float32)))

    def initial(self, batch):
        return (
            jnp.zeros((batch, self.deter)),
            jnp.zeros((batch, self.stoch * self.classes)),
        )

    def _sample(self, logits, key):
        l = _unimix(logits.reshape(logits.shape[:-1] + (self.stoch, self.classes)))
        idx = jax.random.categorical(key, l, -1)
        one = jax.nn.one_hot(idx, self.classes)
        probs = jax.nn.softmax(l, -1)
        one = one + probs - jax.lax.stop_gradient(probs)  # straight-through
        return one.reshape(one.shape[:-2] + (self.stoch * self.classes,))

    def step_prior(self, h, z, a_onehot, key):
        x = self.in_proj(jnp.concatenate([z, a_onehot], -1))
        h, _ = self.gru(h, x)
        prior_logits = self.prior_net(h)
        z_prior = self._sample(prior_logits, key)
        return h, z_prior, prior_logits

    def step_posterior(self, h, obs, key):
        e = self.embed(obs)
        post_logits = self.post_net(jnp.concatenate([h, e], -1))
        z_post = self._sample(post_logits, key)
        return z_post, post_logits

    def __call__(self, h, z, a_onehot, obs, key):
        # one full observe step (used for init shapes)
        k1, k2 = jax.random.split(key)
        h, z_prior, prior_logits = self.step_prior(h, z, a_onehot, k1)
        z_post, post_logits = self.step_posterior(h, obs, k2)
        return h, z_post, prior_logits, post_logits


class Heads(nn.Module):
    obs_dim: int
    bins: int

    @nn.compact
    def __call__(self, feat):
        recon = nn.Dense(self.obs_dim)(MLPBlock((256,))(feat))
        reward_logits = nn.Dense(self.bins)(MLPBlock((256,))(feat))
        cont_logit = nn.Dense(1)(MLPBlock((256,))(feat))[..., 0]
        return recon, reward_logits, cont_logit


class ActorCriticNets(nn.Module):
    num_actions: int
    bins: int

    @nn.compact
    def __call__(self, feat):
        a_logits = nn.Dense(self.num_actions)(MLPBlock((256,))(feat))
        v_logits = nn.Dense(self.bins)(MLPBlock((256,))(feat))
        return a_logits, v_logits


@struct.dataclass
class DreamerActorState:
    h: Array  # [B, deter]
    z: Array  # [B, stoch*classes]
    prev_action: Array  # [B]


@struct.dataclass
class DreamerState:
    wm_params: Any
    ac_params: Any
    wm_opt: Any
    ac_opt: Any
    memory: Any
    ret_low: Array  # percentile return normalization state
    ret_high: Array
    train_count: Array


@struct.dataclass
class DreamerSeq:
    obs: Any  # [L, ...]
    action: Array  # [L]
    reward: Array  # [L]
    cont: Array  # [L] 1 - terminated
    is_first: Array  # [L] episode_start


@dataclasses.dataclass
class DreamerV3Config(AlgoConfig):
    batch_size: int = 16
    batch_length: int = 32
    capacity: int = 5_000  # sequences
    warmup_size: int = 50
    lr_wm: float = 1e-3
    lr_ac: float = 3e-4
    discount: float = 0.997
    horizon: int = 15
    lambda_: float = 0.95
    entropy_coef: float = 3e-4
    kl_dyn_scale: float = 0.5
    kl_rep_scale: float = 0.1
    free_bits: float = 1.0
    deter: int = 128
    stoch: int = 8
    classes: int = 8
    bins: int = 41
    v_min: float = -10.0
    v_max: float = 10.0
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_step_view: bool = True

    def get_name(self) -> str:
        return "DreamerV3"

    @property
    def required_chunk_steps(self) -> int:
        return self.batch_length

    def on_setup(self) -> None:
        self.A = self.action_space.n
        self.obs_dim = self.obs_space.flat_size
        self.rssm = RSSM(self.deter, self.stoch, self.classes, self.obs_space, self.input_block)
        self.heads = Heads(self.obs_dim, self.bins)
        self.ac = ActorCriticNets(self.A, self.bins)
        self._replay = ReplayBuffer(self.capacity, self.warmup_size)
        self._wm_tx = optax.chain(optax.clip_by_global_norm(100.0), optax.adam(self.lr_wm))
        self._ac_tx = optax.chain(optax.clip_by_global_norm(100.0), optax.adam(self.lr_ac))

    def _feat(self, h, z):
        return jnp.concatenate([h, z], -1)

    def _decode_bins(self, logits):
        return funcs.symexp(
            funcs.twohot_decode(jax.nn.softmax(logits, -1), self.bins, self.v_min, self.v_max)
        )

    def _bin_target(self, x):
        return funcs.twohot_encode(funcs.symlog(x), self.bins, self.v_min, self.v_max)

    def _example_seq(self) -> DreamerSeq:
        L = self.batch_length
        obs0 = self.obs_space.zero()
        return DreamerSeq(
            obs=jnp.zeros((L,) + obs0.shape, obs0.dtype),
            action=jnp.zeros((L,), jnp.int32),
            reward=jnp.zeros((L,)),
            cont=jnp.ones((L,)),
            is_first=jnp.zeros((L,), bool),
        )

    def init(self, key: Array) -> DreamerState:
        k1, k2, k3 = jax.random.split(key, 3)
        obs0 = self.obs_space.zero()[None]
        h0 = jnp.zeros((1, self.deter))
        z0 = jnp.zeros((1, self.stoch * self.classes))
        a0 = jnp.zeros((1, self.A))
        wm_params = {
            "rssm": self.rssm.init(k1, h0, z0, a0, obs0, k1),
            "heads": self.heads.init(k2, self._feat(h0, z0)),
        }
        ac_params = self.ac.init(k3, self._feat(h0, z0))
        return DreamerState(
            wm_params=wm_params,
            ac_params=ac_params,
            wm_opt=self._wm_tx.init(wm_params),
            ac_opt=self._ac_tx.init(ac_params),
            memory=self._replay.init(self._example_seq()),
            ret_low=jnp.asarray(0.0),
            ret_high=jnp.asarray(1.0),
            train_count=jnp.asarray(0, jnp.int32),
        )

    # --- actor -----------------------------------------------------------
    def init_actor_state(self, key, num_envs) -> DreamerActorState:
        return DreamerActorState(
            h=jnp.zeros((num_envs, self.deter)),
            z=jnp.zeros((num_envs, self.stoch * self.classes)),
            prev_action=jnp.zeros((num_envs,), jnp.int32),
        )

    def actor_snapshot(self, actor):
        return None

    def policy_step(self, state: DreamerState, actor, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        m = episode_start[:, None].astype(jnp.float32)
        h = actor.h * (1 - m)
        z = actor.z * (1 - m)
        prev_a = jnp.where(episode_start, 0, actor.prev_action)

        k1, k2, k3 = jax.random.split(key, 3)
        a_onehot = jax.nn.one_hot(prev_a, self.A) * (1 - m)
        h, _, _ = self.rssm.apply(
            state.wm_params["rssm"], h, z, a_onehot, k1, method=RSSM.step_prior
        )
        z, _ = self.rssm.apply(
            state.wm_params["rssm"], h, obs, k2, method=RSSM.step_posterior
        )
        a_logits, _ = self.ac.apply(state.ac_params, self._feat(h, z))
        a_logits = jnp.where(invalid_mask, -jnp.inf, a_logits)
        action = jnp.where(
            ctx.training,
            jax.random.categorical(k3, a_logits, -1),
            jnp.argmax(a_logits, -1),
        ).astype(jnp.int32)
        return action, DreamerActorState(h=h, z=z, prev_action=action)

    # --- memory ----------------------------------------------------------
    def observe_chunk(self, state: DreamerState, transitions, mask, sv: StepView) -> DreamerState:
        items = DreamerSeq(
            obs=jnp.moveaxis(sv.obs, 0, 1),
            action=jnp.moveaxis(sv.action, 0, 1),
            reward=jnp.moveaxis(sv.reward, 0, 1),
            cont=jnp.moveaxis(1.0 - sv.terminated.astype(jnp.float32), 0, 1),
            is_first=jnp.moveaxis(sv.episode_start, 0, 1),
        )
        return state.replace(memory=self._replay.add(state.memory, items))

    # --- training --------------------------------------------------------
    def _wm_loss(self, wm_params, batch: DreamerSeq, key):
        Bb, L = batch.action.shape
        h = jnp.zeros((Bb, self.deter))
        z = jnp.zeros((Bb, self.stoch * self.classes))

        obs_t = jnp.moveaxis(jnp.asarray(batch.obs, jnp.float32), 0, 1)  # [L, Bb, ...]
        act_t = jnp.moveaxis(batch.action, 0, 1)
        first_t = jnp.moveaxis(batch.is_first, 0, 1)
        keys = jax.random.split(key, L)

        def step(carry, x):
            h, z, prev_a = carry
            obs, a, first, k = x
            k1, k2 = jax.random.split(k)
            m = first[:, None].astype(jnp.float32)
            h = h * (1 - m)
            z = z * (1 - m)
            a_onehot = jax.nn.one_hot(prev_a, self.A) * (1 - m)
            h, _, prior_logits = self.rssm.apply(
                wm_params["rssm"], h, z, a_onehot, k1, method=RSSM.step_prior
            )
            z, post_logits = self.rssm.apply(
                wm_params["rssm"], h, obs, k2, method=RSSM.step_posterior
            )
            return (h, z, a), (h, z, prior_logits, post_logits)

        (_, _, _), (hs, zs, priors, posts) = jax.lax.scan(
            step, (h, z, jnp.zeros((Bb,), jnp.int32)), (obs_t, act_t, first_t, keys)
        )
        feat = self._feat(hs, zs)  # [L, Bb, F]
        recon, r_logits, c_logit = self.heads.apply(wm_params["heads"], feat)

        obs_flat = obs_t.reshape((L, Bb, -1))
        l_recon = jnp.mean(jnp.sum(jnp.square(recon - funcs.symlog(obs_flat)), -1))
        # ARRIVAL alignment: the reward/continue heads predict the reward obtained on
        # the transition INTO obs_t (imagination reads these heads right after the
        # dynamics step, i.e. at the arrival state) — so targets shift by one step
        rew_t = jnp.moveaxis(batch.reward, 0, 1)  # [L, Bb], reward leaving step t
        cont_t = jnp.moveaxis(batch.cont, 0, 1)
        rew_arr = jnp.concatenate([jnp.zeros_like(rew_t[:1]), rew_t[:-1]], 0)
        cont_arr = jnp.concatenate([jnp.ones_like(cont_t[:1]), cont_t[:-1]], 0)
        r_target = self._bin_target(rew_arr)
        l_reward = -jnp.mean(jnp.sum(r_target * jax.nn.log_softmax(r_logits, -1), -1))
        l_cont = jnp.mean(
            optax.sigmoid_binary_cross_entropy(c_logit, cont_arr)
        )

        # KL balancing with free bits (dreamerv3 eq. 5)
        def kl(p_logits, q_logits):
            shape = p_logits.shape[:-1] + (self.stoch, self.classes)
            lp = jax.nn.log_softmax(p_logits.reshape(shape), -1)
            lq = jax.nn.log_softmax(q_logits.reshape(shape), -1)
            return jnp.sum(jnp.exp(lp) * (lp - lq), (-1, -2))

        dyn = jnp.maximum(kl(jax.lax.stop_gradient(posts), priors), self.free_bits)
        rep = jnp.maximum(kl(posts, jax.lax.stop_gradient(priors)), self.free_bits)
        l_kl = self.kl_dyn_scale * jnp.mean(dyn) + self.kl_rep_scale * jnp.mean(rep)
        loss = l_recon + l_reward + l_cont + l_kl
        return loss, (hs, zs)

    def _imagine(self, wm_params, ac_params, h0, z0, key):
        """Roll the prior forward H steps sampling actions from the actor. Returns the
        full latent CHAIN [H+1] (pre-step states s_0..s_H) plus actions/logits at
        s_0..s_{H-1}."""
        H = self.horizon

        def step(carry, k):
            h, z = carry
            k1, k2 = jax.random.split(k)
            a_logits, _ = self.ac.apply(ac_params, self._feat(h, z))
            a = jax.random.categorical(k1, a_logits, -1)
            h2, z2, _ = self.rssm.apply(
                wm_params["rssm"], h, z, jax.nn.one_hot(a, self.A), k2,
                method=RSSM.step_prior,
            )
            return (h2, z2), (h, z, a, a_logits)

        (h_last, z_last), (hs, zs, acts, logits) = jax.lax.scan(
            step, (h0, z0), jax.random.split(key, H)
        )
        hs = jnp.concatenate([hs, h_last[None]], 0)  # [H+1, N, deter]
        zs = jnp.concatenate([zs, z_last[None]], 0)
        return hs, zs, acts, logits

    def _ac_loss(self, ac_params, wm_params, h0, z0, ret_low, ret_high, key):
        hs, zs, acts, logits_seq = self._imagine(wm_params, ac_params, h0, z0, key)
        feat = self._feat(hs, zs)  # [H+1, N, F]
        # arrival-aligned reward/continue at s_1..s_H
        _, r_logits, c_logit = self.heads.apply(wm_params["heads"], feat[1:])
        rewards = self._decode_bins(r_logits)  # [H, N] — reward of transition t
        conts = jax.nn.sigmoid(c_logit)  # [H, N] — continue prob at arrival
        _, v_logits = self.ac.apply(ac_params, feat)
        values = self._decode_bins(v_logits)  # [H+1, N]

        # lambda returns for transitions t = 0..H-1:
        # R_t = r_t + gamma*c_t*((1-lambda) v(s_{t+1}) + lambda R_{t+1}); R_H = v(s_H)
        disc = self.discount * conts

        def back(carry, x):
            r, d, v_next = x
            ret = r + d * ((1 - self.lambda_) * v_next + self.lambda_ * carry)
            return ret, ret

        _, rets = jax.lax.scan(
            back, values[-1], (rewards[::-1], disc[::-1], values[1:][::-1])
        )
        returns = jax.lax.stop_gradient(rets[::-1])  # [H, N]

        # percentile return normalization
        flat = returns.reshape(-1)
        low = jnp.percentile(flat, 5.0)
        high = jnp.percentile(flat, 95.0)
        ret_low = 0.99 * ret_low + 0.01 * low
        ret_high = 0.99 * ret_high + 0.01 * high
        scale = jnp.maximum(ret_high - ret_low, 1.0)

        # advantage baselines at the DECISION states s_0..s_{H-1}
        adv = jax.lax.stop_gradient((returns - values[:-1]) / scale)
        lp = jax.nn.log_softmax(logits_seq, -1)
        logp_a = jnp.take_along_axis(lp, acts[..., None], -1)[..., 0]
        entropy = -jnp.sum(jnp.exp(lp) * lp, -1)
        weight = jax.lax.stop_gradient(jnp.cumprod(
            jnp.concatenate([jnp.ones_like(disc[:1]), disc[:-1]], 0), 0
        ))
        actor_loss = -jnp.mean(weight * (logp_a * adv + self.entropy_coef * entropy))

        # critic: v(s_t) <- R_t for t = 0..H-1
        v_target = self._bin_target(returns)
        critic_loss = -jnp.mean(
            weight * jnp.sum(v_target * jax.nn.log_softmax(v_logits[:-1], -1), -1)
        )
        return actor_loss + critic_loss, (ret_low, ret_high)

    def train(self, state: DreamerState, key: Array, num_steps: int) -> Tuple[DreamerState, Dict[str, Array]]:
        def one_update(st: DreamerState, k):
            k1, k2, k3 = jax.random.split(k, 3)
            batch, _ = self._replay.sample_with_indices(st.memory, k1, self.batch_size)

            (wm_loss, (hs, zs)), wm_grads = jax.value_and_grad(self._wm_loss, has_aux=True)(
                st.wm_params, batch, k2
            )
            # imagination starts: every posterior state in the batch
            h0 = jax.lax.stop_gradient(hs.reshape((-1, self.deter)))
            z0 = jax.lax.stop_gradient(zs.reshape((-1, self.stoch * self.classes)))
            (ac_loss, (ret_low, ret_high)), ac_grads = jax.value_and_grad(
                self._ac_loss, has_aux=True
            )(st.ac_params, st.wm_params, h0, z0, st.ret_low, st.ret_high, k3)

            if self.pmean_axis is not None:
                wm_grads, ac_grads = self.dp_pmean((wm_grads, ac_grads))

            wm_up, wm_opt = self._wm_tx.update(wm_grads, st.wm_opt, st.wm_params)
            wm_params = optax.apply_updates(st.wm_params, wm_up)
            ac_up, ac_opt = self._ac_tx.update(ac_grads, st.ac_opt, st.ac_params)
            ac_params = optax.apply_updates(st.ac_params, ac_up)

            ready = self._replay.is_warmup_over(st.memory)
            wm_params = masked_update(ready, wm_params, st.wm_params)
            ac_params = masked_update(ready, ac_params, st.ac_params)
            wm_opt = masked_update(ready, wm_opt, st.wm_opt)
            ac_opt = masked_update(ready, ac_opt, st.ac_opt)
            return (
                st.replace(
                    wm_params=wm_params,
                    ac_params=ac_params,
                    wm_opt=wm_opt,
                    ac_opt=ac_opt,
                    ret_low=jnp.where(ready, ret_low, st.ret_low),
                    ret_high=jnp.where(ready, ret_high, st.ret_high),
                    train_count=st.train_count + ready.astype(jnp.int32),
                ),
                (wm_loss, ac_loss),
            )

        state, (wm_losses, ac_losses) = jax.lax.scan(
            one_update, state, jax.random.split(key, num_steps)
        )
        return state, {
            "wm_loss": jnp.mean(wm_losses),
            "ac_loss": jnp.mean(ac_losses),
            "train_count": state.train_count.astype(jnp.float32),
        }

    def params_of(self, state: DreamerState):
        return {"wm": state.wm_params, "ac": state.ac_params}

    def restore_params(self, state: DreamerState, p) -> DreamerState:
        return state.replace(wm_params=p["wm"], ac_params=p["ac"])
