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
