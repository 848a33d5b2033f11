"""Graph-visualization layout queries (reference visualizer.py:85-415).

The reference renders a 3-D NetworkX figure (risk-colored site hubs
with their pages ringed around them).  Rendering is presentation and
out of scope (SURVEY §7.6), but the figure's INPUT — node table with
deterministic coordinates — is analytics and lives here as an
oracle-checkable query (VERDICT r4 task #5).
"""
from __future__ import annotations
