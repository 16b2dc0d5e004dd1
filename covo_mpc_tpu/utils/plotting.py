"""Episode-trace plotting (matplotlib, lazily imported).

Re-designs the reference dashboards (reference: quadjax/dynamics/
utils.py:321-473): rendered episodes are saved as structured arrays
(runtime.render), and these helpers draw position / velocity / attitude
channels against their targets plus reward and actuation traces.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from covo_mpc_tpu.models.rotation import quat_to_rpy


def plot_episode(trace: dict, dt: float, path: str, title: str = "") -> str:
    """Draw the episode dashboard: pos/vel/rpy vs targets, omega vs the
    commanded omega_tar, the disturbance-force trace, reward, and the
    per-channel actuation — channel parity with the reference dashboards
    (reference: quadjax/dynamics/utils.py:321-473).

    ``trace`` is the dict of stacked arrays produced by
    :func:`covo_mpc_tpu.runtime.render.render_episode`; channels missing
    from older traces are skipped.
    Returns the written file path.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    T = trace["pos"].shape[0]
    t = np.arange(T) * dt
    rpy = np.array(quat_to_rpy(trace["quat"]))

    fig, axes = plt.subplots(6, 3, figsize=(15, 15), sharex=True)
    groups = [
        ("pos", trace["pos"], trace.get("pos_tar"), ["x", "y", "z"]),
        ("vel", trace["vel"], trace.get("vel_tar"), ["x", "y", "z"]),
        ("rpy", rpy, None, ["roll", "pitch", "yaw"]),
        ("omega", trace["omega"], trace.get("omega_tar"), ["x", "y", "z"]),
        ("f_disturb", trace.get("f_disturb"), None, ["x", "y", "z"]),
    ]
    for row, (name, val, tar, labels) in enumerate(groups):
        for col in range(3):
            ax = axes[row][col]
            if val is not None:
                ax.plot(t, val[:, col], label=labels[col])
            if tar is not None:
                ax.plot(t, tar[:, col], "--", label=f"{labels[col]} target")
            ax.set_ylabel(f"{name} {labels[col]}")
            ax.legend(fontsize=7)

    axes[5][0].plot(t, trace["reward"])
    axes[5][0].set_ylabel("reward")
    axes[5][1].plot(t, trace["last_thrust"])
    axes[5][1].set_ylabel("thrust [N]")
    if "action" in trace:
        for ch, lab in enumerate(["thrust", "wx", "wy", "wz"]):
            axes[5][2].plot(t, trace["action"][:, ch], label=lab)
        axes[5][2].legend(fontsize=7)
    axes[5][2].set_ylabel("action (normalized)")
    for ax in axes[5]:
        ax.set_xlabel("time [s]")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_eval_errors(err_pos_ep: np.ndarray, path: str, label: str = "") -> str:
    """Per-episode mean tracking-error bar chart for an eval run."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 3))
    ax.bar(np.arange(len(err_pos_ep)), np.asarray(err_pos_ep) * 100)
    ax.set_xlabel("episode")
    ax.set_ylabel("mean err_pos [cm]")
    ax.set_title(label or "evaluation")
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
