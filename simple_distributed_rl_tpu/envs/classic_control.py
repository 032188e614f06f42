"""Classic-control envs as pure JAX dynamics (CartPole, Pendulum, MountainCar, Acrobot).

The reference reaches these through the gym/gymnasium wrappers
(srl/base/env/gymnasium_wrapper.py:228); here they are native jittable dynamics (the
standard published equations) so they vectorize to thousands of instances on TPU. Ids
match gymnasium so user configs carry over.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..spaces import ArrayContinuous, Box, Discrete
from .core import EnvCore, TimeStep
from .registration import register


@struct.dataclass
class VecState:
    x: jax.Array  # [obs dims] f32


class CartPole(EnvCore):
    """Standard CartPole-v1 dynamics (Barto-Sutton-Anderson; euler, tau=0.02)."""

    # truncate AT max steps like gymnasium's TimeLimit (see AutoResetEnv)
    gym_time_limit = True

    gravity = 9.8
    masscart = 1.0
    masspole = 0.1
    length = 0.5
    force_mag = 10.0
    tau = 0.02
    theta_threshold = 12 * 2 * jnp.pi / 360
    x_threshold = 2.4

    def __init__(self, max_steps: int = 500):
        self._max_steps = int(max_steps)

    @property
    def action_space(self):
        return Discrete(2)

    @property
    def observation_space(self):
        high = (self.x_threshold * 2, 1e4, float(self.theta_threshold * 2), 1e4)
        return Box((4,), -max(high), max(high), jnp.float32)

    @property
    def max_episode_steps(self) -> int:
        return self._max_steps

    @property
    def reward_baseline(self):
        return {"episode": 10, "baseline": 450.0}

    def reset(self, key) -> Tuple[VecState, TimeStep]:
        x = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        return VecState(x=x), self.timestep(x)

    def step(self, state: VecState, action, key) -> Tuple[VecState, TimeStep]:
        x, x_dot, theta, theta_dot = state.x
        force = jnp.where(action == 1, self.force_mag, -self.force_mag)
        costheta, sintheta = jnp.cos(theta), jnp.sin(theta)
        total_mass = self.masscart + self.masspole
        polemass_length = self.masspole * self.length

        temp = (force + polemass_length * theta_dot**2 * sintheta) / total_mass
        thetaacc = (self.gravity * sintheta - costheta * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costheta**2 / total_mass)
        )
        xacc = temp - polemass_length * thetaacc * costheta / total_mass

        x = x + self.tau * x_dot
        x_dot = x_dot + self.tau * xacc
        theta = theta + self.tau * theta_dot
        theta_dot = theta_dot + self.tau * thetaacc
        obs = jnp.stack([x, x_dot, theta, theta_dot])

        terminated = (
            (x < -self.x_threshold)
            | (x > self.x_threshold)
            | (theta < -self.theta_threshold)
            | (theta > self.theta_threshold)
        )
        return VecState(x=obs), self.timestep(obs, 1.0, terminated)


class Pendulum(EnvCore):
    """Standard Pendulum-v1: swing-up with torque in [-2, 2]."""

    # truncate AT max steps like gymnasium's TimeLimit (see AutoResetEnv)
    gym_time_limit = True

    max_speed = 8.0
    max_torque = 2.0
    dt = 0.05
    g = 10.0
    m = 1.0
    length = 1.0

    def __init__(self, max_steps: int = 200):
        self._max_steps = int(max_steps)

    @property
    def action_space(self):
        return ArrayContinuous(1, -self.max_torque, self.max_torque)

    @property
    def observation_space(self):
        return Box((3,), -self.max_speed, self.max_speed, jnp.float32)

    @property
    def max_episode_steps(self) -> int:
        return self._max_steps

    @property
    def reward_baseline(self):
        # matches the reference's gym baseline usage for Pendulum DQN long tests
        # (tests/algorithms_/base_dqn.py:38-48): mean reward over 10 eps >= -500
        return {"episode": 10, "baseline": -500.0}

    def _obs(self, th, thdot):
        return jnp.stack([jnp.cos(th), jnp.sin(th), thdot]).astype(jnp.float32)

    def reset(self, key) -> Tuple[VecState, TimeStep]:
        k1, k2 = jax.random.split(key)
        th = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
        thdot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
        return VecState(x=jnp.stack([th, thdot])), self.timestep(self._obs(th, thdot))

    def step(self, state: VecState, action, key) -> Tuple[VecState, TimeStep]:
        th, thdot = state.x
        u = jnp.clip(jnp.asarray(action, jnp.float32).reshape(-1)[0], -self.max_torque, self.max_torque)
        norm_th = ((th + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        cost = norm_th**2 + 0.1 * thdot**2 + 0.001 * u**2

        thdot = thdot + (3 * self.g / (2 * self.length) * jnp.sin(th) + 3.0 / (self.m * self.length**2) * u) * self.dt
        thdot = jnp.clip(thdot, -self.max_speed, self.max_speed)
        th = th + thdot * self.dt

        return VecState(x=jnp.stack([th, thdot])), self.timestep(self._obs(th, thdot), -cost, False)


class MountainCar(EnvCore):
    """Standard MountainCar-v0."""

    # truncate AT max steps like gymnasium's TimeLimit (see AutoResetEnv)
    gym_time_limit = True

    min_position = -1.2
    max_position = 0.6
    max_speed = 0.07
    goal_position = 0.5
    force = 0.001
    gravity = 0.0025

    def __init__(self, max_steps: int = 200):
        self._max_steps = int(max_steps)

    @property
    def action_space(self):
        return Discrete(3)

    @property
    def observation_space(self):
        return Box((2,), self.min_position, self.max_position, jnp.float32)

    @property
    def max_episode_steps(self) -> int:
        return self._max_steps

    def reset(self, key) -> Tuple[VecState, TimeStep]:
        pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
        x = jnp.stack([pos, jnp.asarray(0.0, jnp.float32)])
        return VecState(x=x), self.timestep(x)

    def step(self, state: VecState, action, key) -> Tuple[VecState, TimeStep]:
        position, velocity = state.x
        velocity = velocity + (action - 1) * self.force + jnp.cos(3 * position) * (-self.gravity)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(position + velocity, self.min_position, self.max_position)
        velocity = jnp.where((position == self.min_position) & (velocity < 0), 0.0, velocity)
        terminated = position >= self.goal_position
        obs = jnp.stack([position, velocity])
        return VecState(x=obs), self.timestep(obs, -1.0, terminated)


class Acrobot(EnvCore):
    """Standard Acrobot-v1 (RK4 as in gymnasium, book_or_nips='book')."""

    # truncate AT max steps like gymnasium's TimeLimit (see AutoResetEnv)
    gym_time_limit = True

    dt = 0.2
    LINK_LENGTH_1 = 1.0
    LINK_MASS_1 = 1.0
    LINK_MASS_2 = 1.0
    LINK_COM_POS_1 = 0.5
    LINK_COM_POS_2 = 0.5
    LINK_MOI = 1.0
    MAX_VEL_1 = 4 * jnp.pi
    MAX_VEL_2 = 9 * jnp.pi

    def __init__(self, max_steps: int = 500):
        self._max_steps = int(max_steps)

    @property
    def action_space(self):
        return Discrete(3)

    @property
    def observation_space(self):
        return Box((6,), -float(self.MAX_VEL_2), float(self.MAX_VEL_2), jnp.float32)

    @property
    def max_episode_steps(self) -> int:
        return self._max_steps

    def _obs(self, s):
        th1, th2, dth1, dth2 = s
        return jnp.stack(
            [jnp.cos(th1), jnp.sin(th1), jnp.cos(th2), jnp.sin(th2), dth1, dth2]
        ).astype(jnp.float32)

    def reset(self, key) -> Tuple[VecState, TimeStep]:
        s = jax.random.uniform(key, (4,), jnp.float32, -0.1, 0.1)
        return VecState(x=s), self.timestep(self._obs(s))

    def _dsdt(self, s_aug):
        m1, m2 = self.LINK_MASS_1, self.LINK_MASS_2
        l1 = self.LINK_LENGTH_1
        lc1, lc2 = self.LINK_COM_POS_1, self.LINK_COM_POS_2
        I1 = I2 = self.LINK_MOI
        g = 9.8
        a = s_aug[-1]
        s = s_aug[:-1]
        theta1, theta2, dtheta1, dtheta2 = s
        d1 = m1 * lc1**2 + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(theta2)) + I1 + I2
        d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(theta2)) + I2
        phi2 = m2 * lc2 * g * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
        phi1 = (
            -m2 * l1 * lc2 * dtheta2**2 * jnp.sin(theta2)
            - 2 * m2 * l1 * lc2 * dtheta2 * dtheta1 * jnp.sin(theta2)
            + (m1 * lc1 + m2 * l1) * g * jnp.cos(theta1 - jnp.pi / 2)
            + phi2
        )
        ddtheta2 = (a + d2 / d1 * phi1 - phi2) / (m2 * lc2**2 + I2 - d2**2 / d1)
        ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
        return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2, jnp.asarray(0.0)])

    def step(self, state: VecState, action, key) -> Tuple[VecState, TimeStep]:
        torque = (action - 1).astype(jnp.float32)
        s_aug = jnp.concatenate([state.x, torque[None]])
        # one RK4 step over dt
        dt = self.dt
        k1 = self._dsdt(s_aug)
        k2 = self._dsdt(s_aug + dt / 2 * k1)
        k3 = self._dsdt(s_aug + dt / 2 * k2)
        k4 = self._dsdt(s_aug + dt * k3)
        ns = (s_aug + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4))[:4]
        th1 = ((ns[0] + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        th2 = ((ns[1] + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        d1 = jnp.clip(ns[2], -self.MAX_VEL_1, self.MAX_VEL_1)
        d2 = jnp.clip(ns[3], -self.MAX_VEL_2, self.MAX_VEL_2)
        s = jnp.stack([th1, th2, d1, d2])
        terminated = -jnp.cos(th1) - jnp.cos(th2 + th1) > 1.0
        reward = jnp.where(terminated, 0.0, -1.0)
        return VecState(x=s), self.timestep(self._obs(s), reward, terminated)


register("CartPole-v1", CartPole)
register("Pendulum-v1", Pendulum)
register("MountainCar-v0", MountainCar)
register("Acrobot-v1", Acrobot)
