// TPU-native media decode stage (C ABI, consumed via ctypes).
//
// Replaces the reference's decord dependency (video decode at 1 fps,
// /root/reference/tdc/train.py:588-594, eval/*.py) and its
// soundfile/librosa audio chain (tdc/audio_models/processor.py:38-64:
// read -> mono -> resample 16 kHz) with one FFmpeg-backed shared library:
//
//   tdc_decode_video(path, fps, max_dim, max_frames, ...) ->
//       RGB24 frames, aspect-preserving scaled so max(w, h) == max_dim
//       (pad-to-square happens later in Python, data/images.py), sampled at
//       `fps` by presentation timestamp.
//   tdc_decode_audio(path, rate, max_samples, ...) ->
//       mono float32 PCM at `rate` (16 kHz for BEATs).
//
// Build: media/build.py (g++ -O2 -shared, links libavformat/avcodec/
// swscale/swresample/avutil).  The host thread pool decodes while the TPU
// computes — this stage is the only non-JAX compute in the pipeline.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Media {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream = -1;
};

int open_media(const char* path, enum AVMediaType type, Media* m) {
  if (avformat_open_input(&m->fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(m->fmt, nullptr) < 0) return -2;
  const AVCodec* codec = nullptr;
  m->stream = av_find_best_stream(m->fmt, type, -1, -1, &codec, 0);
  if (m->stream < 0 || !codec) return -3;
  m->dec = avcodec_alloc_context3(codec);
  if (!m->dec) return -4;
  if (avcodec_parameters_to_context(m->dec, m->fmt->streams[m->stream]->codecpar) < 0)
    return -5;
  m->dec->thread_count = 0;  // auto
  if (avcodec_open2(m->dec, codec, nullptr) < 0) return -6;
  return 0;
}

void close_media(Media* m) {
  if (m->dec) avcodec_free_context(&m->dec);
  if (m->fmt) avformat_close_input(&m->fmt);
}

}  // namespace

extern "C" {

// Probe: fills duration (sec), and for the video stream fps/width/height.
// Returns 0 on success.
int tdc_probe(const char* path, double* duration, double* fps, int* width,
              int* height, int* has_audio) {
  Media m;
  if (open_media(path, AVMEDIA_TYPE_VIDEO, &m) != 0) {
    close_media(&m);
    return -1;
  }
  AVStream* st = m.fmt->streams[m.stream];
  *duration = m.fmt->duration > 0 ? m.fmt->duration / (double)AV_TIME_BASE : 0.0;
  AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  *fps = r.den ? av_q2d(r) : 0.0;
  *width = m.dec->width;
  *height = m.dec->height;
  *has_audio =
      av_find_best_stream(m.fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0) >= 0 ? 1 : 0;
  close_media(&m);
  return 0;
}

// Decode frames sampled at `fps`, scaled aspect-preserving so the longer side
// equals max_dim.  `out` must hold max_frames * out_h * out_w * 3 bytes where
// out_w/out_h are returned through the pointers (fixed for the whole clip).
// Returns number of frames written, or negative on error.
int tdc_decode_video(const char* path, double fps, int max_dim, int max_frames,
                     uint8_t* out, int* out_w, int* out_h,
                     double* timestamps) {
  Media m;
  if (open_media(path, AVMEDIA_TYPE_VIDEO, &m) != 0) {
    close_media(&m);
    return -1;
  }
  AVStream* st = m.fmt->streams[m.stream];
  double tb = av_q2d(st->time_base);

  int w = m.dec->width, h = m.dec->height;
  if (w <= 0 || h <= 0) {
    close_media(&m);
    return -2;
  }
  int ow, oh;
  if (w >= h) {
    ow = max_dim;
    oh = std::max(2, (int)((int64_t)h * max_dim / w) & ~1);
  } else {
    oh = max_dim;
    ow = std::max(2, (int)((int64_t)w * max_dim / h) & ~1);
  }
  *out_w = ow;
  *out_h = oh;
  const size_t frame_bytes = (size_t)ow * oh * 3;

  SwsContext* sws =
      sws_getContext(w, h, m.dec->pix_fmt, ow, oh, AV_PIX_FMT_RGB24,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!sws) {  // exotic/unsupported source pixel format
    close_media(&m);
    return -3;
  }
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();

  int n = 0;
  double next_t = 0.0;
  const double step = fps > 0 ? 1.0 / fps : 0.0;
  bool draining = false;
  while (n < max_frames) {
    if (!draining) {
      int r = av_read_frame(m.fmt, pkt);
      if (r < 0) {
        draining = true;
        avcodec_send_packet(m.dec, nullptr);
      } else if (pkt->stream_index != m.stream) {
        av_packet_unref(pkt);
        continue;
      } else {
        avcodec_send_packet(m.dec, pkt);
        av_packet_unref(pkt);
      }
    }
    int r;
    while ((r = avcodec_receive_frame(m.dec, frame)) == 0 && n < max_frames) {
      int64_t pts = frame->best_effort_timestamp;
      double t = pts == AV_NOPTS_VALUE ? next_t : pts * tb;
      if (t + 1e-9 >= next_t) {
        uint8_t* dst[1] = {out + (size_t)n * frame_bytes};
        int dst_ls[1] = {ow * 3};
        sws_scale(sws, frame->data, frame->linesize, 0, h, dst, dst_ls);
        if (timestamps) timestamps[n] = t;
        n++;
        next_t = (step > 0) ? next_t + step : t + 1e18;
      }
      av_frame_unref(frame);
    }
    if (draining && r != 0) break;
    if (r == AVERROR_EOF) break;
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  sws_freeContext(sws);
  close_media(&m);
  return n;
}

// Decode the audio stream to mono float32 at `rate`.  Returns samples
// written, 0 if no audio stream, negative on error.
long tdc_decode_audio(const char* path, int rate, long max_samples,
                      float* out) {
  Media m;
  if (open_media(path, AVMEDIA_TYPE_AUDIO, &m) != 0) {
    close_media(&m);
    return 0;  // no audio stream
  }

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  AVChannelLayout in_layout;
  if (m.dec->ch_layout.nb_channels > 0) {
    av_channel_layout_copy(&in_layout, &m.dec->ch_layout);
  } else {
    av_channel_layout_default(&in_layout, 1);
  }
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, rate, &in_layout,
                          m.dec->sample_fmt, m.dec->sample_rate, 0,
                          nullptr) < 0 ||
      swr_init(swr) < 0) {
    close_media(&m);
    return -1;
  }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  long n = 0;
  std::vector<float> buf;
  bool draining = false;
  while (n < max_samples) {
    if (!draining) {
      int r = av_read_frame(m.fmt, pkt);
      if (r < 0) {
        draining = true;
        avcodec_send_packet(m.dec, nullptr);
      } else if (pkt->stream_index != m.stream) {
        av_packet_unref(pkt);
        continue;
      } else {
        avcodec_send_packet(m.dec, pkt);
        av_packet_unref(pkt);
      }
    }
    int r;
    while ((r = avcodec_receive_frame(m.dec, frame)) == 0 && n < max_samples) {
      int max_out = swr_get_out_samples(swr, frame->nb_samples);
      buf.resize(std::max(1, max_out));
      uint8_t* outp[1] = {(uint8_t*)buf.data()};
      int got = swr_convert(swr, outp, (int)buf.size(),
                            (const uint8_t**)frame->extended_data,
                            frame->nb_samples);
      if (got > 0) {
        long take = std::min((long)got, max_samples - n);
        std::memcpy(out + n, buf.data(), take * sizeof(float));
        n += take;
      }
      av_frame_unref(frame);
    }
    if (draining && r != 0) {
      // flush the resampler
      buf.resize(4096);
      uint8_t* outp[1] = {(uint8_t*)buf.data()};
      int got;
      while ((got = swr_convert(swr, outp, (int)buf.size(), nullptr, 0)) > 0 &&
             n < max_samples) {
        long take = std::min((long)got, max_samples - n);
        std::memcpy(out + n, buf.data(), take * sizeof(float));
        n += take;
      }
      break;
    }
    if (r == AVERROR_EOF) break;
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  swr_free(&swr);
  close_media(&m);
  return n;
}

}  // extern "C"
