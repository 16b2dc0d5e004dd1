"""Visualization: matplotlib dashboards live in utils.plotting; the
optional meshcat 3-D replay lives in viz.meshcat_vis (requires meshcat)."""
