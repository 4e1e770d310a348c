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
    Requires the interaction's energy to read the cell from ``cell`` --
    pass a cell-parameterized closure for interactions holding a baked-in
    cell (PairPotentials exposes ``.cell`` for this).
    """
    volume = jnp.abs(jnp.linalg.det(jnp.asarray(cell)))

    def scaled_energy(eps):
        old_cell = interaction.cell
        try:
            interaction.cell = (1.0 + eps) * jnp.asarray(cell)
            return interaction.energy(params, (1.0 + eps) * xyz, aux)
        finally:
            interaction.cell = old_cell

    w = -jax.grad(scaled_energy)(0.0)
    ke = kinetic_energy(velocities, masses)
    return (2 * ke + w) / (dim * volume)
