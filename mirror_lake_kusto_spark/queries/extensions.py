"""North-star extension queries (dedup / similarity / text / multimodal).

Filled in by operators/{dedup,similarity,text,multimodal}.py.
"""
