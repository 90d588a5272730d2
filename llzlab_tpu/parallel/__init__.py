"""Sharding strategies over the (channel, time) mesh (SURVEY.md layer T3)."""
