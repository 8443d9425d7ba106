"""Structured-Streaming surface: the task lifecycle (SURVEY §2.9).

The reference's dispatcher/worker/monitor triangle is an event-driven
stateful pipeline over etcd watches; here it is one Structured Streaming
job (``lifecycle.py``) over a scripted change-feed (``events.py``).
"""
