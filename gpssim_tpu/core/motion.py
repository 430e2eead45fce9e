"""Trajectory sources: static location, user-motion CSV, interactive control.

Reference: readUserMotion gps.c:2253-2277 (CSV t,x,y,z ECEF at 10 Hz),
static/target setup gps.c:2336-2363, interactive integration gps.c:2714-2729.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .constants import R2D, USER_MOTION_SIZE
from .frames import llh2xyz, ltcmat


def read_user_motion(filename: str, max_rows: int = USER_MOTION_SIZE) -> np.ndarray:
    """Read a CSV motion file of ``t,x,y,z`` rows → float64[N, 3] ECEF."""
    rows = []
    with open(filename, "rt") as fp:
        for line in fp:
            if len(rows) >= max_rows:
                break
            parts = line.strip().split(",")
            if len(parts) < 4:
                break
            try:
                _, x, y, z = (float(p) for p in parts[:4])
            except ValueError:
                break
            rows.append((x, y, z))
    if not rows:
        raise ValueError(f"no motion records in {filename}")
    return np.array(rows, dtype=np.float64)


def static_xyz(lat_deg: float, lon_deg: float, height_m: float) -> np.ndarray:
    """ECEF position of a static receiver (gps.c:2337-2340)."""
    llh = np.array([lat_deg / R2D, lon_deg / R2D, height_m])
    return llh2xyz(llh)


def _add_neu_transposed(xyz: np.ndarray, tmat: np.ndarray, neu) -> np.ndarray:
    """xyz + tmatᵀ·neu — the reference applies the NEU matrix with its rows
    used as columns (gps.c:2352-2357, 2723-2728); that transpose quirk is
    parity-critical and lives only here."""
    out = np.array(xyz, dtype=np.float64)
    for i in range(3):
        out[i] += (
            tmat[0][i] * neu[0] + tmat[1][i] * neu[1] + tmat[2][i] * neu[2]
        )
    return out


def apply_target_offset(
    xyz0: np.ndarray,
    llh: np.ndarray,
    distance_m: float,
    bearing_millideg: float,
    height_m: float,
) -> np.ndarray:
    """Shift the start position by a distance/bearing/height target.

    Reference gps.c:2348-2357; bearing is stored scaled by 1000 in the CLI
    layer (gps-sim.c:148), hence the /1000 here. Note the transpose use of
    the NEU matrix (rows used as columns) matches the reference.
    """
    import math

    t = ltcmat(llh)
    dirb = (bearing_millideg / 1000.0) / R2D
    neu = np.array(
        [
            distance_m * math.cos(dirb),
            distance_m * math.sin(dirb),
            height_m,
        ]
    )
    return _add_neu_transposed(xyz0, t, neu)


@dataclass
class InteractiveState:
    """Live-controllable kinematic state (gps-sim.h:36-46 target_t subset)."""

    bearing_millideg: float = 0.0  # bearing * 1000, as the reference stores it
    velocity: float = 0.0  # ground speed [m/s]
    vertical_speed: float = 0.0  # [m/s]

    def step(self, xyz: np.ndarray, tmat: np.ndarray, dt: float = 0.1) -> np.ndarray:
        """Integrate one epoch of motion (reference gps.c:2720-2728)."""
        import math

        dirb = (self.bearing_millideg / 1000.0) / R2D
        neu = np.array(
            [
                (self.velocity * math.cos(dirb)) * dt,
                (self.velocity * math.sin(dirb)) * dt,
                self.vertical_speed * dt,
            ]
        )
        return _add_neu_transposed(xyz, tmat, neu)
