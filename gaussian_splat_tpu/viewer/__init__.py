"""Interactive viewing: trackball camera controls and a headless frame server."""
