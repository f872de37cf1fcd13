from .render import render_frame, render_trajectory  # noqa: F401
