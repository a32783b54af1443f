from .pitch import PitchParams, PitchTrack, pitch_track_ac, pitch_track_cc

__all__ = ["PitchParams", "PitchTrack", "pitch_track_ac", "pitch_track_cc"]
