"""Checkpoint / resume of a running simulation.

The reference offers three partial mechanisms (SURVEY.md §5): model pickling
(model.py:330-378), container persistence with retrieve(path, isel='last')
(container.py:177-208), and fields pickling — but no one-call resume.  Here a
checkpoint is a single HDF5 file holding the full restartable state:
(t, i, output dt, the scheme's adaptive internal dt, every field array, the
parameter dict), written atomically.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np


def save_checkpoint(path, simulation):
    """Write a restartable snapshot of a Simulation."""
    import h5py

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    fields = simulation.fields
    internal_dt = getattr(simulation._scheme, "_internal_dt", None)
    with h5py.File(tmp, "w") as f:
        f.attrs["t"] = float(simulation.t)
        f.attrs["i"] = int(simulation.i)
        f.attrs["dt"] = float(simulation.user_dt)
        f.attrs["tmax"] = (
            float(simulation.tmax) if simulation.tmax is not None else np.nan
        )
        f.attrs["id"] = simulation.id
        if internal_dt is not None:
            f.attrs["internal_dt"] = float(internal_dt)
        f.attrs["parameters"] = json.dumps(
            {
                k: (np.asarray(v).tolist() if hasattr(v, "shape") else v)
                for k, v in simulation.parameters.items()
            }
        )
        g = f.create_group("fields")
        for key in fields.keys():
            g.create_dataset(key, data=np.asarray(fields[key]))
    os.replace(tmp, path)
    return path


def load_checkpoint(path, model, **simulation_kwargs):
    """Rebuild a Simulation from a checkpoint file.

    Extra kwargs (hook, scheme, tol, ...) are forwarded to the Simulation
    constructor; tmax/dt/t/id default to the checkpointed values."""
    import h5py

    from ..core.simulation import Simulation

    with h5py.File(path, "r") as f:
        t = float(f.attrs["t"])
        i = int(f.attrs["i"])
        dt = float(f.attrs["dt"])
        tmax = float(f.attrs["tmax"])
        tmax = None if np.isnan(tmax) else tmax
        sim_id = f.attrs["id"]
        internal_dt = f.attrs.get("internal_dt")
        parameters = json.loads(f.attrs["parameters"])
        data = {k: f["fields"][k][...] for k in f["fields"]}

    parameters = {
        k: (np.asarray(v) if isinstance(v, list) else v)
        for k, v in parameters.items()
    }
    simulation_kwargs.setdefault("tmax", tmax)
    simulation_kwargs.setdefault("id", sim_id)
    simul = Simulation(model, data, parameters, dt=dt, t=t,
                       **simulation_kwargs)
    simul.i = i
    if internal_dt is not None and hasattr(simul._scheme, "_internal_dt"):
        simul._scheme._internal_dt = float(internal_dt)
    return simul


def save_ensemble_checkpoint(path, ensemble):
    """Write a restartable snapshot of an Ensemble: (t, member states,
    helpers, shared-or-per-member internal dt, member parameter sets).
    Same atomic write-then-rename discipline as save_checkpoint."""
    import h5py

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with h5py.File(tmp, "w") as f:
        f.attrs["kind"] = "ensemble"
        f.attrs["t"] = float(ensemble.t)
        f.attrs["id"] = ensemble.id
        f.attrs["parameters"] = json.dumps([
            {
                k: (np.asarray(v).tolist() if hasattr(v, "shape") else v)
                for k, v in p.items()
            }
            for p in ensemble._parameter_sets
        ])
        idt = ensemble._internal_dt
        if idt is not None:
            f.create_dataset("internal_dt",
                             data=np.atleast_1d(np.asarray(idt, np.float64)))
            f.attrs["internal_dt_scalar"] = not getattr(idt, "ndim", 0)
        from ..ops.df64 import host64

        # df64 ensembles store the exact f64 value (hi + lo); the rebuild's
        # from_float64 split reproduces the identical DF pair (bit-exact
        # resume, same property tests/test_checkpoint.py pins for
        # Simulation)
        f.create_dataset("u", data=host64(ensemble.u))
        f.create_dataset("helpers", data=host64(ensemble.helpers))
        f.create_dataset("x", data=host64(ensemble.x))
    os.replace(tmp, path)
    return path


def load_ensemble_checkpoint(path, model, **ensemble_kwargs):
    """Rebuild an Ensemble from a checkpoint file.

    Extra kwargs (scheme, tol, per_member_dt, mesh, ...) are forwarded to
    the Ensemble constructor; t, the member states, and the adaptive
    internal dt resume from the checkpointed values."""
    import h5py

    from ..parallel.ensemble import Ensemble

    with h5py.File(path, "r") as f:
        t = float(f.attrs["t"])
        ens_id = str(f.attrs["id"])
        parameter_sets = json.loads(f.attrs["parameters"])
        u = f["u"][...]
        helpers = f["helpers"][...]
        x = f["x"][...]
        idt = f["internal_dt"][...] if "internal_dt" in f else None
        idt_scalar = bool(f.attrs.get("internal_dt_scalar", True))

    parameter_sets = [
        {k: (np.asarray(v) if isinstance(v, list) else v)
         for k, v in p.items()}
        for p in parameter_sets
    ]
    ens = Ensemble(model, u, parameter_sets, x, helpers0=helpers,
                   **ensemble_kwargs)
    ens.t = t
    ens.id = ens_id
    if idt is not None:
        ens._set_internal_dt(float(idt[0]) if idt_scalar else idt)
    return ens
