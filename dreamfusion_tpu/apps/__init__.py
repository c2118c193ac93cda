"""Interactive apps: GUI viewer/trainer core and the gradio web demo."""
