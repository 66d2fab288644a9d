// Compressed-audio IO via FFmpeg's libav* (system libraries).
//
// TPU-native replacement for the reference's PyAV decode path
// (audiocraft/data/audio.py:72-145) and ffmpeg-subprocess encode path
// (audiocraft/data/audio.py:147-232, audiocraft/data/audio_utils.py:233-316).
// The data plane stays on the host CPU; this library gives the dataset
// loader sample-accurate seek decode for mp3/ogg/flac/aac/opus/wav and
// mp3/ogg/flac/aac encode for audio_write and the watermark attack suite.
//
// All functions return >= 0 on success and a negative errno-style code on
// failure; no exceptions, no global state. Output float32 is planar with a
// caller-provided capacity stride (out[c * cap_frames + t]).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
#include <libavutil/channel_layout.h>
#include <libavutil/intreadwrite.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <algorithm>
#include <cstring>
#include <string>
#include <vector>

namespace {

// keep libav quiet (e.g. mp3 "Estimating duration from bitrate" spam)
struct LogLevelInit {
  LogLevelInit() { av_log_set_level(AV_LOG_ERROR); }
} g_log_level_init;

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_index = -1;

  ~Reader() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  // Open `path` and set up the best audio stream's decoder.
  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* codec = nullptr;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (stream_index < 0 || !codec) return -3;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -4;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream_index]->codecpar) < 0)
      return -5;
    if (avcodec_open2(dec, codec, nullptr) < 0) return -6;
    return 0;
  }
};

}  // namespace

extern "C" {

// Metadata without a full decode. frames is an estimate for VBR formats
// (duration * sample_rate), exact for WAV/FLAC.
int av_audio_info(const char* path, int* sample_rate, int* channels,
                  long* frames, double* duration) {
  Reader r;
  int rc = r.open(path);
  if (rc < 0) return rc;
  AVStream* st = r.fmt->streams[r.stream_index];
  int sr = r.dec->sample_rate;
  if (sr <= 0) return -7;
  *sample_rate = sr;
  *channels = r.dec->ch_layout.nb_channels;
  double dur = 0.0;
  if (st->duration > 0) {
    dur = st->duration * av_q2d(st->time_base);
  } else if (r.fmt->duration > 0) {
    dur = (double)r.fmt->duration / AV_TIME_BASE;
  }
  *duration = dur;
  if (st->nb_frames > 0 && st->codecpar->frame_size > 0 &&
      r.dec->codec_id == AV_CODEC_ID_FLAC) {
    *frames = st->nb_frames * st->codecpar->frame_size;  // upper bound
    *frames = (long)(dur * sr + 0.5);
  } else {
    *frames = (long)(dur * sr + 0.5);
  }
  return 0;
}

// Decode [seek, seek+duration) to planar float32 at native sr/channels.
// Writes channel c at out[c * cap_frames + t]; stops once cap_frames frames
// are produced. duration <= 0 means "to end of file". Returns frames written.
long av_audio_read(const char* path, double seek_time, double duration,
                   float* out, long cap_frames, int* out_sr, int* out_ch) {
  Reader r;
  int rc = r.open(path);
  if (rc < 0) return rc;
  AVStream* st = r.fmt->streams[r.stream_index];
  const int sr = r.dec->sample_rate;
  const int ch = r.dec->ch_layout.nb_channels;
  if (sr <= 0 || ch <= 0) return -7;
  *out_sr = sr;
  *out_ch = ch;
  if (cap_frames <= 0) return 0;

  // Seek to the closest keyframe at or before the target, then decode and
  // drop samples until the requested start (the reference's PyAV path does
  // the same trim: data/audio.py:100-112).
  long start_frame = (long)(seek_time * sr + 0.5);
  if (seek_time > 0) {
    // Pre-roll: seek ~0.2s early so predictive codecs (mp3 bit reservoir,
    // aac) re-prime their state; the pts-based trim below discards the
    // warmup samples, making the seek effectively sample-accurate.
    double target = seek_time > 0.2 ? seek_time - 0.2 : 0.0;
    int64_t ts = av_rescale_q((int64_t)(target * AV_TIME_BASE),
                              AV_TIME_BASE_Q, st->time_base);
    if (av_seek_frame(r.fmt, r.stream_index, ts, AVSEEK_FLAG_BACKWARD) < 0) {
      // fall back to decoding from the top
      av_seek_frame(r.fmt, r.stream_index, 0,
                    AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_BYTE);
    } else {
      avcodec_flush_buffers(r.dec);
    }
  }

  SwrContext* swr = nullptr;  // lazily created only if fmt != fltp/flt
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  long written = 0;
  bool know_pos = false;   // becomes true once a frame carries a valid pts
  long pos = 0;            // current decode position in samples
  // Output sample k of the stream sits at raw pts (k + start_time); a
  // decoder-trimmed first frame (AV_PKT_DATA_SKIP_SAMPLES, e.g. the mp3
  // Xing encoder delay) starts `skip` samples into its packet's pts range.
  long start_time_samples = 0;
  if (st->start_time != AV_NOPTS_VALUE)
    start_time_samples =
        (long)(st->start_time * av_q2d(st->time_base) * sr + 0.5);
  long first_skip = 0;
  bool done = false, draining = false;
  int err = 0;

  std::vector<float> tmp;  // interleaved conversion buffer
  while (!done) {
    if (!draining) {
      int rrc = av_read_frame(r.fmt, pkt);
      if (rrc < 0) {
        draining = true;
        avcodec_send_packet(r.dec, nullptr);
      } else {
        if (pkt->stream_index != r.stream_index) {
          av_packet_unref(pkt);
          continue;
        }
        if (!know_pos) {
          size_t sd_size = 0;
          uint8_t* sd = av_packet_get_side_data(
              pkt, AV_PKT_DATA_SKIP_SAMPLES, &sd_size);
          if (sd && sd_size >= 4)
            first_skip = (long)AV_RL32(sd);
        }
        if (avcodec_send_packet(r.dec, pkt) < 0) {
          av_packet_unref(pkt);
          continue;  // tolerate corrupt packets like the reference decoder
        }
        av_packet_unref(pkt);
      }
    }
    while (true) {
      int frc = avcodec_receive_frame(r.dec, frame);
      if (frc == AVERROR(EAGAIN)) break;
      if (frc == AVERROR_EOF) { done = true; break; }
      if (frc < 0) { err = -8; done = true; break; }
      if (!know_pos) {
        if (frame->pts != AV_NOPTS_VALUE) {
          pos = (long)(frame->pts * av_q2d(st->time_base) * sr + 0.5)
                + first_skip - start_time_samples;
        }
        know_pos = true;
      }
      long n = frame->nb_samples;
      long lo = std::max(start_frame - pos, 0L);  // skip pre-seek samples
      if (lo < n && written < cap_frames) {
        long take = std::min(n - lo, cap_frames - written);
        const float* src = nullptr;
        bool planar_src = false;
        if (frame->format == AV_SAMPLE_FMT_FLTP) {
          planar_src = true;
        } else if (frame->format == AV_SAMPLE_FMT_FLT) {
          src = (const float*)frame->data[0];
        } else {
          if (!swr) {
            if (swr_alloc_set_opts2(&swr, &r.dec->ch_layout,
                                    AV_SAMPLE_FMT_FLT, sr, &r.dec->ch_layout,
                                    (AVSampleFormat)frame->format, sr, 0,
                                    nullptr) < 0 || swr_init(swr) < 0) {
              err = -9; done = true; break;
            }
          }
          tmp.resize((size_t)n * ch);
          uint8_t* outp = (uint8_t*)tmp.data();
          int got = swr_convert(swr, &outp, (int)n,
                                (const uint8_t**)frame->extended_data, (int)n);
          if (got < 0) { err = -9; done = true; break; }
          n = std::min<long>(n, got);
          take = std::min(n - lo, cap_frames - written);
          src = tmp.data();
        }
        if (take > 0) {
          if (planar_src) {
            for (int c = 0; c < ch; c++) {
              const float* chan = (const float*)frame->extended_data[c];
              std::memcpy(out + (size_t)c * cap_frames + written, chan + lo,
                          take * sizeof(float));
            }
          } else if (src) {
            for (int c = 0; c < ch; c++) {
              float* dst = out + (size_t)c * cap_frames + written;
              for (long t = 0; t < take; t++)
                dst[t] = src[(lo + t) * ch + c];
            }
          }
          written += take;
        }
      }
      pos += frame->nb_samples;
      av_frame_unref(frame);
      long want_end = duration > 0
          ? start_frame + (long)(duration * sr + 0.5) : -1;
      if (written >= cap_frames || (want_end > 0 && pos >= want_end)) {
        done = true;
        break;
      }
    }
  }
  if (swr) swr_free(&swr);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (err < 0 && written == 0) return err;
  // honor an explicit duration request precisely
  if (duration > 0) {
    long want = std::min((long)(duration * sr + 0.5), cap_frames);
    written = std::min(written, want);
  }
  return written;
}

// Encode interleaved float32 [frames x channels] to `path`. format_name in
// {"wav","mp3","ogg","flac","aac","opus"}; bitrate_kbps used by lossy codecs
// (0 = codec default). Returns 0 on success.
int av_audio_write(const char* path, const float* interleaved, long frames,
                   int channels, int sample_rate, const char* format_name,
                   int bitrate_kbps) {
  std::string fmt_name = format_name ? format_name : "wav";
  const char* mux_name = nullptr;
  const char* enc_name = nullptr;
  if (fmt_name == "wav") { mux_name = "wav"; enc_name = "pcm_s16le"; }
  else if (fmt_name == "mp3") { mux_name = "mp3"; enc_name = "libmp3lame"; }
  else if (fmt_name == "ogg") { mux_name = "ogg"; enc_name = "libvorbis"; }
  else if (fmt_name == "flac") { mux_name = "flac"; enc_name = "flac"; }
  else if (fmt_name == "aac" || fmt_name == "m4a" || fmt_name == "mp4") {
    mux_name = "mp4"; enc_name = "aac";
  } else if (fmt_name == "opus") { mux_name = "ogg"; enc_name = "libopus"; }
  else return -1;

  const AVCodec* codec = avcodec_find_encoder_by_name(enc_name);
  if (!codec && fmt_name == "ogg")
    codec = avcodec_find_encoder_by_name("vorbis");
  if (!codec) return -2;

  AVFormatContext* oc = nullptr;
  if (avformat_alloc_output_context2(&oc, nullptr, mux_name, path) < 0 || !oc)
    return -3;
  AVStream* st = avformat_new_stream(oc, nullptr);
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  SwrContext* swr = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int err = 0;

  auto cleanup = [&]() {
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (swr) swr_free(&swr);
    if (enc) avcodec_free_context(&enc);
    if (oc) {
      if (!(oc->oformat->flags & AVFMT_NOFILE) && oc->pb)
        avio_closep(&oc->pb);
      avformat_free_context(oc);
    }
  };

  // opus only supports specific rates; resample to 48k if needed
  int enc_sr = sample_rate;
  if (std::string(enc_name) == "libopus") {
    const int ok[] = {48000, 24000, 16000, 12000, 8000};
    bool found = false;
    for (int r2 : ok) if (r2 == sample_rate) found = true;
    if (!found) enc_sr = 48000;
  }
  enc->sample_rate = enc_sr;
  av_channel_layout_default(&enc->ch_layout, channels);
  enc->time_base = AVRational{1, enc_sr};
  // pick a sample format the encoder supports, preferring float
  enc->sample_fmt = AV_SAMPLE_FMT_FLTP;
  if (codec->sample_fmts) {
    enc->sample_fmt = codec->sample_fmts[0];
    for (const AVSampleFormat* f = codec->sample_fmts;
         *f != AV_SAMPLE_FMT_NONE; f++) {
      if (*f == AV_SAMPLE_FMT_FLTP || *f == AV_SAMPLE_FMT_FLT) {
        enc->sample_fmt = *f;
        break;
      }
    }
  }
  if (bitrate_kbps > 0) enc->bit_rate = (int64_t)bitrate_kbps * 1000;
  if (std::string(enc_name) == "aac")
    enc->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
  if (oc->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(enc, codec, nullptr) < 0) { err = -4; cleanup(); return err; }
  if (avcodec_parameters_from_context(st->codecpar, enc) < 0) {
    err = -5; cleanup(); return err;
  }
  st->time_base = enc->time_base;
  if (!(oc->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) {
      err = -6; cleanup(); return err;
    }
  }
  if (avformat_write_header(oc, nullptr) < 0) { err = -7; cleanup(); return err; }

  // src: interleaved float @ sample_rate → enc->sample_fmt @ enc_sr
  AVChannelLayout in_layout;
  av_channel_layout_default(&in_layout, channels);
  if (swr_alloc_set_opts2(&swr, &enc->ch_layout, enc->sample_fmt, enc_sr,
                          &in_layout, AV_SAMPLE_FMT_FLT, sample_rate, 0,
                          nullptr) < 0 || swr_init(swr) < 0) {
    err = -8; cleanup(); return err;
  }

  const int chunk = enc->frame_size > 0 ? enc->frame_size : 4096;
  pkt = av_packet_alloc();
  frame = av_frame_alloc();
  long src_pos = 0;
  int64_t pts = 0;
  bool flushed_swr = false;
  while (true) {
    frame->nb_samples = chunk;
    frame->format = enc->sample_fmt;
    av_channel_layout_copy(&frame->ch_layout, &enc->ch_layout);
    frame->sample_rate = enc_sr;
    if (av_frame_get_buffer(frame, 0) < 0) { err = -9; break; }
    const uint8_t* in_ptr = (const uint8_t*)(interleaved + src_pos * channels);
    long src_avail = frames - src_pos;
    int got;
    if (src_avail > 0) {
      // feed as much source as needed for one output chunk
      long feed = std::min<long>(
          src_avail, av_rescale(chunk, sample_rate, enc_sr) + 32);
      got = swr_convert(swr, frame->data, chunk, &in_ptr, (int)feed);
      src_pos += feed;
    } else if (!flushed_swr) {
      got = swr_convert(swr, frame->data, chunk, nullptr, 0);
      if (got <= 0) flushed_swr = true;
    } else {
      got = 0;
    }
    if (got < 0) { err = -10; break; }
    bool final_flush = (got == 0);
    int src_err = 0;
    if (!final_flush) {
      frame->nb_samples = got;
      frame->pts = pts;
      pts += got;
      src_err = avcodec_send_frame(enc, frame);
    } else {
      src_err = avcodec_send_frame(enc, nullptr);  // drain encoder
    }
    av_frame_unref(frame);
    if (src_err < 0 && src_err != AVERROR_EOF) { err = -11; break; }
    while (true) {
      int prc = avcodec_receive_packet(enc, pkt);
      if (prc == AVERROR(EAGAIN) || prc == AVERROR_EOF) break;
      if (prc < 0) { err = -12; break; }
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      if (av_interleaved_write_frame(oc, pkt) < 0) { err = -13; }
      av_packet_unref(pkt);
    }
    if (err < 0 || final_flush) break;
  }
  if (err == 0) av_write_trailer(oc);
  av_channel_layout_uninit(&in_layout);
  cleanup();
  return err;
}

}  // extern "C"
