"""Optimizer construction (optax).

Reproduces the reference's fastai OptimWrapper semantics
(second/pytorch/builder/optimizer_builder.py + torchplus/train/
fastai_optim.py:154-167): grad-clip by global norm 10.0 before the step
(train.py:323), ``fixed_weight_decay`` (true AdamW: multiplicative
p *= 1 - lr*wd, equal to optax.adamw's decoupled decay) vs classic
L2-in-gradient decay, with weight decay applied to ALL parameters
including norm scales and biases (bn_wd=True upstream).  The OneCycle
momentum annealing drives adam's b1 through inject_hyperparams.
"""

from typing import NamedTuple

import optax

from ..configs import schema
from . import schedules

GRAD_CLIP_NORM = 10.0


def build(optimizer_config: schema.Optimizer, total_step):
    """Optimizer proto -> (optax.GradientTransformation, lr_fn, mom_fn).

    use_moving_average: supported here (the reference raises,
    optimizer_builder.py:92-93): the optimizer state additionally
    tracks an EMA of the updated parameters at moving_average_decay
    (default 0.9999); read it back with :func:`ema_params` for eval.
    """
    which = optimizer_config.WhichOneof("optimizer")
    fixed_wd = optimizer_config.fixed_weight_decay

    def _finalize(tx):
        if optimizer_config.use_moving_average:
            decay = optimizer_config.moving_average_decay or 0.9999
            return _with_param_ema(tx, decay)
        return tx

    if which == "adam_optimizer":
        cfg = optimizer_config.adam_optimizer
        if cfg.amsgrad:
            raise NotImplementedError("amsgrad not supported")
        lr_fn, mom_fn = schedules.build(
            cfg.learning_rate, total_step, default_momentum=0.9)
        wd = cfg.weight_decay

        @optax.inject_hyperparams
        def make(lr, b1):
            if fixed_wd:
                tx = optax.adamw(lr, b1=b1, b2=0.999, eps=1e-8,
                                 weight_decay=wd)
            else:
                tx = optax.chain(
                    optax.add_decayed_weights(wd),
                    optax.scale_by_adam(b1=b1, b2=0.999, eps=1e-8),
                    optax.scale_by_learning_rate(lr),  # scales by -lr
                )
            return optax.chain(optax.clip_by_global_norm(GRAD_CLIP_NORM), tx)

        tx = _finalize(make(lr=lr_fn, b1=mom_fn))
        return tx, lr_fn, mom_fn

    if which == "momentum_optimizer":
        cfg = optimizer_config.momentum_optimizer
        lr_fn, mom_fn = schedules.build(
            cfg.learning_rate, total_step,
            default_momentum=cfg.momentum_optimizer_value)
        wd = cfg.weight_decay

        @optax.inject_hyperparams
        def make(lr, mom):
            return optax.chain(
                optax.clip_by_global_norm(GRAD_CLIP_NORM),
                optax.add_decayed_weights(wd),
                optax.sgd(lr, momentum=mom),
            )

        return _finalize(make(lr=lr_fn, mom=mom_fn)), lr_fn, mom_fn

    if which == "rms_prop_optimizer":
        cfg = optimizer_config.rms_prop_optimizer
        lr_fn, mom_fn = schedules.build(
            cfg.learning_rate, total_step,
            default_momentum=cfg.momentum_optimizer_value)

        @optax.inject_hyperparams
        def make(lr, mom):
            return optax.chain(
                optax.clip_by_global_norm(GRAD_CLIP_NORM),
                optax.add_decayed_weights(cfg.weight_decay),
                optax.rmsprop(
                    lr, decay=cfg.decay or 0.9, eps=cfg.epsilon or 1e-8,
                    momentum=mom),
            )

        return _finalize(make(lr=lr_fn, mom=mom_fn)), lr_fn, mom_fn

    raise ValueError("empty optimizer config")


class ParamEmaState(NamedTuple):
    inner: object
    ema: object


def _with_param_ema(tx, decay):
    """Wrap ``tx`` so its state also carries an EMA of the UPDATED
    parameters (TF object-detection-style use_moving_average; the EMA
    rides the optimizer state so checkpoints carry it for free)."""
    import jax

    def init(params):
        import jax.numpy as jnp

        # materialize COPIES: aliasing the live param buffers would
        # double-donate under a jitted train step
        return ParamEmaState(
            tx.init(params),
            jax.tree_util.tree_map(lambda p: jnp.array(p), params))

    def update(grads, state, params=None, **extra):
        updates, new_inner = tx.update(grads, state.inner, params, **extra)
        new_params = optax.apply_updates(params, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_params)
        return updates, ParamEmaState(new_inner, new_ema)

    return optax.GradientTransformation(init, update)


def ema_params(opt_state):
    """Extract the parameter EMA from a use_moving_average optimizer
    state, or None if the optimizer wasn't built with it."""
    if isinstance(opt_state, ParamEmaState):
        return opt_state.ema
    return None


def freeze_by_patterns(tx, params, include=None, exclude=None):
    """Wrap ``tx`` so params matching the regex filters get zero updates
    (reference freeze_params_v2, train.py:94-107)."""
    import re

    import jax

    include_re = re.compile(include) if include else None
    exclude_re = re.compile(exclude) if exclude else None

    def label(path, _):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        frozen = False
        if include_re is not None and include_re.match(name) is not None:
            frozen = True
        if exclude_re is not None and exclude_re.match(name) is None:
            frozen = True
        return "frozen" if frozen else "train"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels)
