"""Learning-rate / momentum schedules.

Ports of the fastai-style schedules the reference trains with
(torchplus/train/learning_schedules_fastai.py): OneCycle
(super-convergence: cosine lr warmup+anneal with inverse momentum
annealing), staircase exponential decay, manual stepping.  Each builder
returns jit-traceable ``step -> value`` callables (optax schedule
convention).

Note: the reference's non-staircase exponential branch drops the
initial_learning_rate factor (learning_schedules_fastai.py:115-117,
upstream bug); we implement the obviously-intended
``init * factor**(progress/decay_length)``.
"""

import jax.numpy as jnp

from ..configs import schema


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1
    return end + (start - end) / 2 * cos_out


def one_cycle(total_step, lr_max, moms, div_factor, pct_start):
    """Returns (lr_schedule, momentum_schedule)."""
    low_lr = lr_max / div_factor
    a1 = max(int(total_step * pct_start), 1)
    a2 = max(total_step - a1, 1)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip(step / a1, 0.0, 1.0)
        p2 = jnp.clip((step - a1) / a2, 0.0, 1.0)
        up = annealing_cos(low_lr, lr_max, p1)
        down = annealing_cos(lr_max, low_lr / 1e4, p2)
        return jnp.where(step < a1, up, down)

    def mom_fn(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip(step / a1, 0.0, 1.0)
        p2 = jnp.clip((step - a1) / a2, 0.0, 1.0)
        down = annealing_cos(moms[0], moms[1], p1)
        up = annealing_cos(moms[1], moms[0], p2)
        return jnp.where(step < a1, down, up)

    return lr_fn, mom_fn


def exponential_decay(total_step, initial_lr, decay_length, decay_factor,
                      staircase=True):
    assert 0 < decay_length < 1
    decay_steps = decay_length * total_step

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        n = step / decay_steps
        if staircase:
            n = jnp.floor(n)
        return initial_lr * jnp.power(decay_factor, n)

    return lr_fn


def manual_stepping(total_step, boundaries, rates):
    assert len(rates) == len(boundaries) + 1
    bsteps = jnp.asarray([b * total_step for b in boundaries])
    rates_arr = jnp.asarray(rates)

    def lr_fn(step):
        idx = jnp.sum(jnp.asarray(step, jnp.float32) >= bsteps)
        return rates_arr[idx]

    return lr_fn


def build(lr_config: schema.LearningRate, total_step, default_momentum=0.9):
    """LearningRate proto -> (lr_schedule, momentum_schedule)."""
    which = lr_config.WhichOneof("learning_rate")
    if which == "one_cycle":
        c = lr_config.one_cycle
        return one_cycle(
            total_step, c.lr_max, list(c.moms), c.div_factor, c.pct_start)
    if which == "exponential_decay":
        c = lr_config.exponential_decay
        lr_fn = exponential_decay(
            total_step, c.initial_learning_rate, c.decay_length,
            c.decay_factor, c.staircase)
        return lr_fn, (lambda step: jnp.asarray(default_momentum))
    if which == "manual_stepping":
        c = lr_config.manual_stepping
        lr_fn = manual_stepping(total_step, list(c.boundaries), list(c.rates))
        return lr_fn, (lambda step: jnp.asarray(default_momentum))
    if which == "multi_phase":
        raise NotImplementedError(
            "multi_phase lr (eval'd lambda strings) is not supported; use "
            "one_cycle / exponential_decay / manual_stepping")
    raise ValueError("empty learning rate config")
