from .cnn_lstm import CNNLSTM, ResidualBlock, AttentionPooling, BiLSTM

__all__ = ["CNNLSTM", "ResidualBlock", "AttentionPooling", "BiLSTM"]
