"""XTree ("CrossTree") capability layer — the reference's second-generation
tool (xtree.c): flat KPod-grid database, dual-hierarchy taxonomy,
confidence/LCA calling, capitalist redistribution, coverage outputs."""

from utree_tpu.xtree.build import build_xtree_db, read_xtr, write_xtr, XtreeDB

__all__ = ["build_xtree_db", "read_xtr", "write_xtr", "XtreeDB"]
