"""Post-hoc plotting of collected simulation series.

Reference analog: `SimulationResults.plot_DER_simulation(plot_type=...)`
(SURVEY.md §2.1 #4, `[pvder:pvder/simulation_utilities.py]` — unverified
upstream path). Reproduces the reference's plot set (voltage / current /
power / duty cycle / frequency / DC-link vs t) from pvderx series dicts.
"""
from __future__ import annotations

import numpy as np

PLOT_TYPES = ("power", "voltage", "current", "duty_cycle", "frequency", "dc",
              "all")


class SimulationResults:
    """Wraps a series dict from `pvderx.sim.simulate` / `DynamicSimulation`."""

    def __init__(self, series: dict, title: str = "PV-DER simulation"):
        self.series = {k: np.asarray(v) for k, v in series.items()}
        self.title = title

    def plot_DER_simulation(self, plot_type: str = "power", save_path=None,
                            show: bool = False):
        import matplotlib
        if not show:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = self.series["t"]
        if plot_type == "all":
            # the reference notebooks' overview panel: every plot type at once
            fig, axes = plt.subplots(3, 2, figsize=(12, 9), sharex=True)
            panels = ["power", "voltage", "current", "duty_cycle",
                      "frequency", "dc"]
            for ax, pt in zip(axes.flat, panels):
                self._draw(ax, t, pt)
                ax.legend(fontsize=8)
                ax.grid(True, alpha=0.3)
            for ax in axes[-1]:
                ax.set_xlabel("t [s]")
            fig.suptitle(self.title)
            if save_path:
                fig.savefig(save_path, dpi=120, bbox_inches="tight")
            if show:  # pragma: no cover
                plt.show()
            plt.close(fig)
            return save_path
        fig, ax = plt.subplots(figsize=(8, 4))
        self._draw(ax, t, plot_type)
        ax.set_xlabel("t [s]")
        ax.legend()
        ax.grid(True, alpha=0.3)
        ax.set_title(f"{self.title}: {plot_type}")
        if save_path:
            fig.savefig(save_path, dpi=120, bbox_inches="tight")
        if show:  # pragma: no cover
            plt.show()
        plt.close(fig)
        return save_path

    def _draw(self, ax, t, plot_type):
        if plot_type == "power":
            ax.plot(t, self.series["p_pcc"], label="P_PCC [pu]")
            ax.plot(t, self.series["q_pcc"], label="Q_PCC [pu]")
            ax.plot(t, self.series["p_pv"], label="P_PV [pu]", ls="--")
        elif plot_type == "voltage":
            ax.plot(t, self.series["v_mag"], label="|V_PCC| [pu]")
            ax.plot(t, self.series["vdc"], label="Vdc [pu]", ls="--")
        elif plot_type == "current":
            ax.plot(t, self.series["i_mag"], label="|i| [pu]")
        elif plot_type == "duty_cycle":
            ax.plot(t, self.series["m_mag"], label="|m|")
        elif plot_type == "frequency":
            ax.plot(t, 60.0 * self.series["f_meas"], label="f [Hz]")
        elif plot_type == "dc":
            ax.plot(t, self.series["vdc"], label="Vdc [pu]")
        else:
            raise ValueError(f"plot_type must be one of {PLOT_TYPES}")
