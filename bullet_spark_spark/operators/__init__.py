"""Capability-extension operators (SURVEY §2.5, M4/M5).

The reference has none of these (its only 'join' is the keyed state merge at
JoinStreaming.scala:20-27); they are first-class here because a PySpark-native
engine gets them from Catalyst, and because the north-star use case (large
scale training-data pipelines) needs dedup / similarity / text analysis.
"""
