from .lstm import lstm_scan_pallas, pallas_available

__all__ = ["lstm_scan_pallas", "pallas_available"]
