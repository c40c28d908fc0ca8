"""Pallas TPU kernels for the hot ops where XLA's op-granular lowering falls
short (SURVEY.md §7 stage 11).

The fused self-play move spends most of its time NOT in the network but in
the MCTS bookkeeping: the XLA sim loop lowers to ~95 small fusions plus
~360 async VMEM copies per simulation (see CLAUDE.md round-1 measurements).
``tree_kernel`` collapses the whole per-simulation tree transition —
expand + backup + sequential-halving tick + next leaf selection — into one
Pallas kernel that keeps every tree array resident in VMEM.
"""

from minizero_tpu.ops.tree_kernel import fused_tree_step, tree_step_reference

__all__ = ["fused_tree_step", "tree_step_reference"]
