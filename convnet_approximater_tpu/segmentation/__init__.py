"""Segmentation package (placeholder, matching the reference's empty
``src/approx/segmentation/`` and fully-commented-out ``models/segnext.py``:
segmentation never materialized upstream).  The MSCAN backbone already
returns per-stage feature maps (``models/mscan.py:MSCAN``), so a SegNeXt-style
decode head is the only missing piece if this is ever needed."""
