"""AlphaZero (parity: srl/algorithms/alphazero/ — PUCT tree search guided by a
policy+value network, dirichlet root noise, min-max Q normalization, visit-count
policy targets, Monte-Carlo value targets, proportional action sampling for the first
``sampling_steps`` of each episode).

TPU re-design: the reference's per-decision python tree (alphazero.py:196-300) becomes
fixed-size node arrays searched in lockstep for ALL envs — each simulation is
[vectorized PUCT descend (while_loop)] -> [ONE batched network eval on the MXU] ->
[vectorized backup], the mctx pattern, with the functional env stepping node states
directly (no backup/restore bookkeeping). Episode returns for the value target are
computed chunk-wide by a reverse scan instead of per-worker history lists
(alphazero.py:328-347); only episodes that complete inside the chunk are stored.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from ..define import RLBaseTypes
from ..memories.replay_buffer import ReplayBuffer
from ..models.blocks import InputBlockConfig, MLPBlock
from ..utils import rl_functions as funcs
from .base import AlgoConfig, PolicyContext, StepView
from .common import masked_update
import optax

Array = jax.Array

UNSET = -1


class PVNetwork(nn.Module):
    """Policy+value twin heads (parity: alphazero.py Network; value_type "rate" =
    tanh head, "linear" = linear head)."""

    num_actions: int
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]
    value_type: str = "rate"

    @nn.compact
    def __call__(self, x):
        h = self.input_block.create_block(self.obs_space)(jnp.asarray(x, jnp.float32))
        h = MLPBlock(self.hidden)(h)
        logits = nn.Dense(self.num_actions, kernel_init=nn.initializers.zeros)(h)
        v = nn.Dense(1)(MLPBlock((64,))(h))[..., 0]
        if self.value_type == "rate":
            v = jnp.tanh(v)
        return logits, v


@struct.dataclass
class AZActorState:
    sampling_step: Array  # [B] steps taken this episode
    last_pi: Array  # [B, A] root visit distribution of the last decision
    last_v: Array  # [B] root value estimate


@struct.dataclass
class AZState:
    params: Any
    opt_state: Any
    memory: Any
    q_min: Array
    q_max: Array
    train_count: Array


@struct.dataclass
class AZItem:
    obs: Any
    policy: Array  # [A]
    z: Array  # discounted return-to-go


@dataclasses.dataclass
class AlphaZeroConfig(AlgoConfig):
    num_simulations: int = 50
    discount: float = 1.0
    sampling_steps: int = 1
    root_dirichlet_alpha: float = 0.3
    root_exploration_fraction: float = 0.25
    c_base: float = 19652.0
    c_init: float = 1.25
    batch_size: int = 64
    capacity: int = 100_000
    warmup_size: int = 500
    lr: float = 0.002
    value_type: str = "rate"  # "rate" | "linear"
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (128,)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    needs_env_state: bool = True
    has_actor_state: bool = True
    needs_step_view: bool = True
    policy_updates_state: bool = False

    def get_name(self) -> str:
        return "AlphaZero"

    def on_setup(self) -> None:
        self.A = self.action_space.n
        self.model = PVNetwork(
            self.A, self.obs_space, self.input_block, self.hidden_sizes, self.value_type
        )
        self._replay = ReplayBuffer(self.capacity, self.warmup_size)
        self._tx = optax.adam(self.lr)
        self.M = self.num_simulations + 1  # node budget per tree

    def _example_item(self) -> AZItem:
        return AZItem(
            obs=self.obs_space.zero(),
            policy=jnp.full((self.A,), 1.0 / self.A),
            z=jnp.asarray(0.0),
        )

    def init(self, key: Array) -> AZState:
        params = self.model.init(key, self.obs_space.zero()[None])
        return AZState(
            params=params,
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_item()),
            q_min=jnp.asarray(jnp.inf),
            q_max=jnp.asarray(-jnp.inf),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key: Array, num_envs: int) -> AZActorState:
        return AZActorState(
            sampling_step=jnp.zeros((num_envs,), jnp.int32),
            last_pi=jnp.full((num_envs, self.A), 1.0 / self.A),
            last_v=jnp.zeros((num_envs,)),
        )

    def actor_snapshot(self, actor: AZActorState):
        return {"pi": actor.last_pi, "v": actor.last_v}

    # ------------------------------------------------------------------
    # batched tree search
    # ------------------------------------------------------------------
    def _search(self, params, env_states, ts, q_min, q_max, key, is_training):
        """Run num_simulations PUCT simulations for every env simultaneously.
        Returns (root_visit_counts [B, A], root_value [B], q_min', q_max').
        ``is_training`` (traced bool) gates the dirichlet root noise."""
        B, A, M = ts.invalid_mask.shape[0], self.A, self.M
        env = self.env

        k_root, k_noise, key = jax.random.split(key, 3)
        enc0 = jax.vmap(self.obs_encoder.encode)(ts.obs)
        logits0, v0 = self.model.apply(params, jnp.asarray(enc0, jnp.float32))
        prior0 = jax.nn.softmax(jnp.where(ts.invalid_mask, -jnp.inf, logits0), axis=-1)
        noise = jax.random.dirichlet(
            k_noise, jnp.full((A,), self.root_dirichlet_alpha), (B,)
        )
        e = jnp.where(is_training, self.root_exploration_fraction, 0.0)
        prior0 = (1 - e) * prior0 + e * noise
        prior0 = jnp.where(ts.invalid_mask, 0.0, prior0)
        prior0 = prior0 / jnp.maximum(prior0.sum(-1, keepdims=True), 1e-12)

        # node arrays [B, M, ...]; node 0 = root
        def rep(x):
            return jnp.broadcast_to(x[:, None], (B, M) + x.shape[1:]).copy()

        node_state = jax.tree.map(rep, env_states)  # env state AT the node
        node_invalid = rep(ts.invalid_mask)
        node_player = rep(ts.next_player)
        node_done = jnp.zeros((B, M), bool)
        node_reward = jnp.zeros((B, M))  # acting player's reward on the edge INTO node
        node_enemy = jnp.zeros((B, M), bool)  # player changed on the edge into node
        child_prior = jnp.zeros((B, M, A)).at[:, 0].set(prior0)
        child_index = jnp.full((B, M, A), UNSET, jnp.int32)
        visits = jnp.zeros((B, M))
        value_sum = jnp.zeros((B, M))

        def puct(node, cp, ci, vis, vsum, inv, qmin, qmax, k):
            """PUCT scores for one env at `node` (alphazero.py:272-300)."""
            n_par = vis[node]
            c = jnp.log((1 + n_par + self.c_base) / self.c_base) + self.c_init
            child = ci[node]  # [A]
            n = jnp.where(child >= 0, vis[jnp.maximum(child, 0)], 0.0)
            q = jnp.where(
                child >= 0,
                vsum[jnp.maximum(child, 0)] / jnp.maximum(vis[jnp.maximum(child, 0)], 1.0),
                0.0,
            )
            q = jnp.where(qmin < qmax, (q - qmin) / jnp.maximum(qmax - qmin, 1e-12), q)
            score = q + c * cp[node] * jnp.sqrt(n_par) / (1.0 + n)
            score = jnp.where(inv[node], -jnp.inf, score)
            return funcs.random_max_index(score[None], jnp.zeros((1, A), bool), k)[0]

        def one_sim(carry, sim_i):
            (node_state, node_invalid, node_player, node_done, node_reward, node_enemy,
             child_prior, child_index, visits, value_sum, qmin, qmax, key) = carry
            new_idx = sim_i + 1  # node slot to fill this simulation

            # --- descend (vmapped bounded walk) ----------------------------
            def descend(ns, ninv, npl, ndone, cp, ci, vis, vsum, k):
                path = jnp.full((M,), UNSET, jnp.int32)
                acts = jnp.full((M,), 0, jnp.int32)

                def cond(c):
                    cur, depth, stop, *_ = c
                    return jnp.logical_not(stop)

                def body(c):
                    cur, depth, stop, path, acts, k = c
                    k, kk = jax.random.split(k)
                    a = puct(cur, cp, ci, vis, vsum, ninv, qmin, qmax, kk)
                    path = path.at[depth].set(cur)
                    acts = acts.at[depth].set(a)
                    nxt = ci[cur, a]
                    # stop when the chosen edge is unexpanded or current node terminal
                    stop = jnp.logical_or(nxt == UNSET, ndone[cur])
                    cur = jnp.where(stop, cur, nxt)
                    return cur, depth + 1, stop, path, acts, k

                cur, depth, _, path, acts, k = jax.lax.while_loop(
                    cond, body, (jnp.asarray(0), jnp.asarray(0), jnp.asarray(False), path, acts, k)
                )
                # leaf parent = last path entry; action = last action
                leaf_parent = path[depth - 1]
                leaf_action = acts[depth - 1]
                return path, acts, depth, leaf_parent, leaf_action

            key, k_desc, k_step = jax.random.split(key, 3)
            path, acts, depth, parent, action = jax.vmap(descend)(
                node_state, node_invalid, node_player, node_done,
                child_prior, child_index, visits, value_sum,
                jax.random.split(k_desc, B),
            )

            # --- step env from the parent node ------------------------------
            idxB = jnp.arange(B)
            parent_state = jax.tree.map(lambda x: x[idxB, parent], node_state)
            parent_player = node_player[idxB, parent]
            parent_done = node_done[idxB, parent]
            a_env = jax.vmap(self.action_encoder.decode)(action)
            st2, ts2 = jax.vmap(env.step)(parent_state, a_env, jax.random.split(k_step, B))
            edge_reward = ts2.rewards[idxB, parent_player]
            enemy = ts2.next_player != parent_player

            # --- batched network eval on the new leaves ---------------------
            enc = jax.vmap(self.obs_encoder.encode)(ts2.obs)
            logits, v_leaf = self.model.apply(params, jnp.asarray(enc, jnp.float32))
            prior = jax.nn.softmax(jnp.where(ts2.invalid_mask, -jnp.inf, logits), axis=-1)
            leaf_done = jnp.logical_or(ts2.terminated, ts2.truncated)
            leaf_value = jnp.where(leaf_done, 0.0, v_leaf)

            # --- write the new node (skip if parent was terminal) ------------
            write = jnp.logical_not(parent_done)  # [B]

            def w(buf, val):
                old = buf[idxB, new_idx]
                m = write.reshape((B,) + (1,) * (val.ndim - 1))
                return buf.at[idxB, new_idx].set(jnp.where(m, val, old))

            node_state = jax.tree.map(w, node_state, st2)
            node_invalid = w(node_invalid, ts2.invalid_mask)
            node_player = w(node_player, ts2.next_player)
            node_done = w(node_done, leaf_done)
            node_reward = w(node_reward, edge_reward)
            node_enemy = w(node_enemy, enemy)
            child_prior = w(child_prior, prior)
            # connect parent edge
            ci_old = child_index[idxB, parent, action]
            child_index = child_index.at[idxB, parent, action].set(
                jnp.where(write, new_idx, ci_old)
            )

            # --- backup along path (+ the new leaf when written) -------------
            # mirrors the reference exactly (alphazero.py:253-266): walk
            # reversed(search_path); at each node flip the value on enemy edges,
            # add the edge reward and discount, then accumulate into the stats.
            def backup(path, depth, visits_row, vsum_row, nrew, nenemy, leaf_v, write):
                vis, vs = visits_row, vsum_row
                # new leaf first (it is the deepest chain entry when written)
                val = jnp.where(write, leaf_v, 0.0)
                leaf_val = nrew[new_idx] + self.discount * jnp.where(
                    nenemy[new_idx], -val, val
                )
                vis = vis.at[new_idx].add(jnp.where(write, 1.0, 0.0))
                vs = vs.at[new_idx].add(jnp.where(write, leaf_val, 0.0))
                val = jnp.where(write, leaf_val, 0.0)

                def body(i, c):
                    val, vis, vs = c
                    node = path[depth - 1 - i]
                    newval = nrew[node] + self.discount * jnp.where(nenemy[node], -val, val)
                    vis = vis.at[node].add(1.0)
                    vs = vs.at[node].add(newval)
                    return newval, vis, vs

                _, vis, vs = jax.lax.fori_loop(0, depth, body, (val, vis, vs))
                return vis, vs

            visits, value_sum = jax.vmap(backup)(
                path, depth, visits, value_sum, node_reward, node_enemy,
                leaf_value, write,
            )

            # min-max Q normalization stats (alphazero.py:262-266)
            q_all = value_sum / jnp.maximum(visits, 1.0)
            qmin = jnp.minimum(qmin, jnp.min(jnp.where(visits > 0, q_all, jnp.inf)))
            qmax = jnp.maximum(qmax, jnp.max(jnp.where(visits > 0, q_all, -jnp.inf)))

            return (node_state, node_invalid, node_player, node_done, node_reward,
                    node_enemy, child_prior, child_index, visits, value_sum, qmin, qmax, key), None

        carry = (node_state, node_invalid, node_player, node_done, node_reward,
                 node_enemy, child_prior, child_index, visits, value_sum, q_min, q_max, key)
        carry, _ = jax.lax.scan(one_sim, carry, jnp.arange(self.num_simulations))
        (_, _, _, _, _, _, _, child_index, visits, value_sum, q_min, q_max, _) = carry

        # root child visit counts
        idxB = jnp.arange(B)[:, None]
        root_children = child_index[:, 0]  # [B, A]
        counts = jnp.where(
            root_children >= 0, visits[idxB, jnp.maximum(root_children, 0)], 0.0
        )
        return counts, v0, q_min, q_max

    # ------------------------------------------------------------------
    def policy_step(self, state: AZState, actor: AZActorState, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        is_training = ctx.training

        key, k_search, k_pick = jax.random.split(key, 3)
        counts, v0, q_min, q_max = self._search(
            state.params, ctx.env_state, ctx.timestep, state.q_min, state.q_max,
            k_search, is_training,
        )
        total = jnp.maximum(counts.sum(-1, keepdims=True), 1.0)
        pi = counts / total

        sampling_step = jnp.where(episode_start, 0, actor.sampling_step)
        # proportional sampling early in the episode, argmax after
        logits = jnp.where(counts > 0, jnp.log(jnp.maximum(counts, 1e-12)), -jnp.inf)
        a_prop = jax.random.categorical(k_pick, logits, axis=-1).astype(jnp.int32)
        a_max = funcs.random_max_index(counts, jnp.zeros_like(invalid_mask), k_pick)
        explore = jnp.logical_and(is_training, sampling_step < self.sampling_steps)
        action = jnp.where(explore, a_prop, a_max)

        new_actor = AZActorState(
            sampling_step=sampling_step + 1,
            last_pi=pi,
            last_v=v0,
        )
        return action, new_actor

    # note: q_min/q_max stats persist via observe_chunk (policy cannot mutate state
    # on the has_actor_state path) — we recompute them cheaply from stored z's there.
    def observe_chunk(self, state: AZState, transitions, mask, sv: StepView) -> AZState:
        T, B = sv.reward.shape
        done = jnp.logical_or(sv.terminated, sv.truncated)

        # discounted return-to-go within the chunk (alphazero MC target)
        def back(carry, x):
            r, d = x
            ret = r + self.discount * jnp.where(d, 0.0, carry)
            return ret, ret

        _, rets = jax.lax.scan(
            back, jnp.zeros((B,)), (sv.reward[::-1], done[::-1])
        )
        z = rets[::-1]  # [T, B]

        # completed[t]: a done occurs at or after t within the chunk
        def fwd(carry, d):
            seen = jnp.logical_or(carry, d)
            return seen, seen

        _, completed = jax.lax.scan(fwd, jnp.zeros((B,), bool), done[::-1])
        completed = completed[::-1]

        was_reset = jnp.concatenate([jnp.zeros_like(done[:1]), done[:-1]], axis=0)
        valid = jnp.logical_and(completed, jnp.logical_not(was_reset))

        items = AZItem(obs=sv.obs, policy=sv.actor_snapshot["pi"], z=z)
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), items)
        memory = self._replay.add_masked(state.memory, flat, valid.reshape(-1))
        # persist min-max normalization bounds from observed returns
        zz = jnp.where(valid, z, jnp.nan)
        q_min = jnp.minimum(state.q_min, jnp.nanmin(zz))
        q_max = jnp.maximum(state.q_max, jnp.nanmax(zz))
        return state.replace(memory=memory, q_min=q_min, q_max=q_max)

    # ------------------------------------------------------------------
    def train(self, state: AZState, key: Array, num_steps: int) -> Tuple[AZState, Dict[str, Array]]:
        def one_update(st: AZState, k):
            batch, _ = self._replay.sample_with_indices(st.memory, k, self.batch_size)

            def loss_fn(params):
                logits, v = self.model.apply(params, jnp.asarray(batch.obs, jnp.float32))
                lp = jax.nn.log_softmax(logits, axis=-1)
                l_pi = -jnp.mean(jnp.sum(batch.policy * lp, axis=-1))
                l_v = jnp.mean(jnp.square(v - batch.z))
                return l_pi + l_v

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            if self.pmean_axis is not None:
                grads = self.dp_pmean(grads)
            updates, opt_state = self._tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            ready = self._replay.is_warmup_over(st.memory)
            params = masked_update(ready, new_params, st.params)
            opt_state = masked_update(ready, opt_state, st.opt_state)
            return (
                st.replace(
                    params=params,
                    opt_state=opt_state,
                    train_count=st.train_count + ready.astype(jnp.int32),
                ),
                loss,
            )

        state, losses = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {"loss": jnp.mean(losses), "train_count": state.train_count.astype(jnp.float32)}

    def params_of(self, state: AZState):
        return {"params": state.params, "q_min": state.q_min, "q_max": state.q_max}

    def restore_params(self, state: AZState, p) -> AZState:
        return state.replace(params=p["params"], q_min=p["q_min"], q_max=p["q_max"])
