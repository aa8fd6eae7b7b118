"""``python -m slideo_tpu`` == the slideo CLI."""

from .app.cli import main

raise SystemExit(main())
