"""Optimization: per-module AdamW + OneCycle, the MultiOptimizer equivalent.

Parity: reference optimizers.py:11-73 + train.py:133-154. Each of the 8
modules gets its own AdamW (lr 1e-4, betas (0, 0.99), eps 1e-9, wd 1e-4);
'decoder' and 'style_encoder' run at ft_lr (1e-5). The reference builds a
OneCycleLR but never steps it (train.py never calls optimizer.scheduler()),
and with div_factor=final_div_factor=1 and pct_start=0 the schedule is
constant anyway — we provide the schedule for completeness but default to
constant, matching effective reference behavior.

The alternating GAN update (optimizer.step('msd')/step('mpd') then the five
generator-module steps, train.py:272-328) maps to updating per-module optax
states from per-module grads inside one jitted train step.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import optax

ACOUSTIC_MODULES = ("decoder", "style_encoder")  # ft_lr (train.py:147-154)


def onecycle_schedule(max_lr: float, total_steps: int, pct_start: float = 0.0,
                      div_factor: float = 1.0, final_div_factor: float = 1.0):
    """torch OneCycleLR(anneal='cos') equivalent (optimizers.py:53-63)."""
    if div_factor == 1.0 and final_div_factor == 1.0 and pct_start == 0.0:
        return max_lr  # constant — the reference's effective config
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=max_lr, pct_start=pct_start,
        div_factor=div_factor, final_div_factor=final_div_factor)


def make_adamw(lr, weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """AdamW(lr, betas=(0.0, 0.99), eps=1e-9, wd=1e-4) (optimizers.py:66)."""
    return optax.adamw(learning_rate=lr, b1=0.0, b2=0.99, eps=1e-9,
                       weight_decay=weight_decay)


class MultiOptimizer:
    """Per-module optimizers with individual step() — functional version of
    reference optimizers.MultiOptimizer."""

    def __init__(self, params: Mapping[str, Any], lr: float = 1e-4,
                 ft_lr: float = 1e-5, total_steps: int = 0,
                 overrides: Optional[Dict[str, float]] = None):
        self.txs: Dict[str, optax.GradientTransformation] = {}
        self.lrs: Dict[str, float] = {}
        overrides = overrides or {}
        for key in params:
            module_lr = overrides.get(
                key, ft_lr if key in ACOUSTIC_MODULES else lr)
            self.lrs[key] = module_lr
            self.txs[key] = make_adamw(module_lr)

    def init(self, params: Mapping[str, Any]) -> Dict[str, Any]:
        return {k: self.txs[k].init(params[k]) for k in self.txs}

    def step(self, key: str, grads, opt_state, params):
        """Update one module (reference optimizers.py:30-39)."""
        updates, new_state = self.txs[key].update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state

    def step_modules(self, keys, grads: Mapping[str, Any],
                     opt_states: Dict[str, Any], params: Dict[str, Any]
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Update several modules from a grads dict; others untouched."""
        new_params = dict(params)
        new_states = dict(opt_states)
        for k in keys:
            new_params[k], new_states[k] = self.step(
                k, grads[k], opt_states[k], params[k])
        return new_params, new_states
