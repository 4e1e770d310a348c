"""Bulk thermodynamic observables: temperature and pressure.

Parity target: /root/reference/torchmd/thermo.py.  The reference
``Temperature`` (thermo.py:57-67) returns 2*KE/N_dof in energy units; the
reference ``Pressure`` (thermo.py:17-54) is broken (references undefined
``x``/``pair``/``cell_diag``; see SURVEY.md "known bugs").  Here the virial
is computed correctly and differentiably via an isotropic strain derivative
of the potential energy (jax.grad through the energy function), the natural
JAX analog of the reference's intent of differentiating wrt the cell
(interface.py:56 cell.requires_grad).
"""

import jax
import jax.numpy as jnp

from . import units


def kinetic_energy(velocities, masses):
    m = jnp.asarray(masses).reshape(-1, 1)
    return 0.5 * (m * velocities ** 2).sum()


def temperature(velocities, masses, dim=3):
    """Instantaneous kinetic temperature in *energy* units (2 KE / N_dof),
    matching reference thermo.py:57-67.  Divide by units.kB for Kelvin."""
    n_dof = velocities.shape[-2] * dim
    return 2 * kinetic_energy(velocities, masses) / n_dof


def temperature_kelvin(velocities, masses, dim=3):
    return temperature(velocities, masses, dim) / units.kB


def pressure(interaction, params, xyz, aux, velocities, masses, cell,
             dim=3):
    """P = (2 KE + W) / (dim V) with virial W = -dU/d(strain).

    The strain derivative scales positions and cell uniformly:
    U(eps) = U((1+eps) q; (1+eps) cell); W = -dU/deps|_0 = sum_i f_i . r_i.
    Uses the Interaction contract's dynamic ``cell=`` override (diagonal
    cells), so it works for PairPotentials, GNNPotentials and whole
    Stacks, is differentiable in ``params`` AND in ``xyz``/``velocities``
    (so it can sit at the end of a trajectory as a fitting target -- see
    train/fit_rdf_pair.py pressure_weight), and is jit/vmap-safe.
    """
    cell = jnp.asarray(cell)
    cell_len = jnp.diag(cell) if cell.ndim == 2 else cell
    volume = jnp.abs(jnp.prod(cell_len))

    def scaled_energy(eps):
        return interaction.energy(params, (1.0 + eps) * xyz, aux,
                                  cell=(1.0 + eps) * cell_len)

    w = -jax.grad(scaled_energy)(0.0)
    ke = kinetic_energy(velocities, masses)
    return (2 * ke + w) / (dim * volume)
