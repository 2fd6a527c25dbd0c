from .readmission import readmit_events, readmit_labels

__all__ = ["readmit_events", "readmit_labels"]
