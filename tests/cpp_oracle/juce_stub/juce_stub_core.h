// Minimal JUCE API stub — just enough to compile the reference plugin sources
// (/root/reference/src/**) unmodified into a Linux shared library that serves
// as the *ground-truth oracle* for the null tests in tests/test_cpp_null.py.
//
// This is NOT a JUCE reimplementation: only the symbols the reference DSP
// actually touches exist here, and every math helper reproduces the exact
// float32 operation order of the real JUCE implementation it stands in for
// (juce_core/maths/juce_MathsFunctions.h, juce_audio_basics/
// juce_AudioSampleBuffer.h, juce_audio_basics/utilities/juce_Decibels.h) so
// the compiled reference DSP is bit-faithful to a real JUCE build.
//
// GUI classes (Component/Timer/Slider/...) are declaration-only shells: the
// reference editors are declared but their .cpps are never compiled, and the
// oracle harness never instantiates an editor, so their member functions can
// remain undefined symbols in the .so (loaded with RTLD_LAZY).
#pragma once

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <initializer_list>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#if defined(__SSE__) || defined(__x86_64__)
#include <immintrin.h>
#endif

#ifndef JucePlugin_Name
#define JucePlugin_Name "JuicyOracle"
#endif
#define JUCE_CALLTYPE
#define JUCE_DECLARE_NON_COPYABLE_WITH_LEAK_DETECTOR(className) \
  className(const className&) = delete;                         \
  className& operator=(const className&) = delete;

namespace juce
{

// ----- maths helpers (exact op order of juce_MathsFunctions.h) -----
template <typename T>
struct MathConstants
{
    static constexpr T pi = static_cast<T>(3.141592653589793238L);
    static constexpr T twoPi = static_cast<T>(2 * 3.141592653589793238L);
};

template <typename T> inline T jmax(T a, T b) { return a < b ? b : a; }
template <typename T> inline T jmin(T a, T b) { return b < a ? b : a; }
template <typename T>
inline T jlimit(T lowerLimit, T upperLimit, T v)
{
    return v < lowerLimit ? lowerLimit : (upperLimit < v ? upperLimit : v);
}
template <typename T>
inline T jmap(T value0To1, T targetRangeMin, T targetRangeMax)
{
    return targetRangeMin + value0To1 * (targetRangeMax - targetRangeMin);
}
template <typename T>
inline T jmap(T sourceValue, T sourceRangeMin, T sourceRangeMax,
              T targetRangeMin, T targetRangeMax)
{
    return targetRangeMin
         + ((targetRangeMax - targetRangeMin) * (sourceValue - sourceRangeMin))
               / (sourceRangeMax - sourceRangeMin);
}
template <typename... Ts> inline void ignoreUnused(Ts&&...) {}

struct Decibels
{
    template <typename T>
    static T decibelsToGain(T decibels, T minusInfinityDb = static_cast<T>(-100))
    {
        return decibels > minusInfinityDb
                   ? std::pow(static_cast<T>(10.0), decibels * static_cast<T>(0.05))
                   : T();
    }
    template <typename T>
    static T gainToDecibels(T gain, T minusInfinityDb = static_cast<T>(-100))
    {
        return gain > T() ? jmax(minusInfinityDb,
                                 static_cast<T>(std::log10(gain)) * static_cast<T>(20.0))
                          : minusInfinityDb;
    }
};

// FTZ/DAZ on the audio path, like juce::ScopedNoDenormals (SSE path).
class ScopedNoDenormals
{
public:
    ScopedNoDenormals()
    {
#if defined(__SSE__) || defined(__x86_64__)
        mxcsr = _mm_getcsr();
        _mm_setcsr(mxcsr | 0x8040u);  // FTZ | DAZ
#endif
    }
    ~ScopedNoDenormals()
    {
#if defined(__SSE__) || defined(__x86_64__)
        _mm_setcsr(mxcsr);
#endif
    }
private:
#if defined(__SSE__) || defined(__x86_64__)
    unsigned int mxcsr = 0;
#endif
};

// ----- String -----
class String
{
public:
    String() = default;
    String(const char* c) : s(c == nullptr ? "" : c) {}
    String(const std::string& c) : s(c) {}
    bool operator==(const String& o) const { return s == o.s; }
    bool operator!=(const String& o) const { return s != o.s; }
    bool operator<(const String& o) const { return s < o.s; }
    const char* toRawUTF8() const { return s.c_str(); }
    const std::string& std_str() const { return s; }
private:
    std::string s;
};

struct StringArray
{
    StringArray() = default;
    StringArray(std::initializer_list<String> il) : items(il) {}
    size_t size() const { return items.size(); }
    std::vector<String> items;
};

// ----- MemoryBlock / XmlElement / ValueTree (functional minimum for
//       get/setStateInformation round-trips) -----
class MemoryBlock
{
public:
    void append(const void* data, size_t bytes)
    {
        auto* p = static_cast<const char*>(data);
        buf.insert(buf.end(), p, p + bytes);
    }
    const void* getData() const { return buf.data(); }
    void* getData() { return buf.data(); }
    size_t getSize() const { return buf.size(); }
private:
    std::vector<char> buf;
};

class XmlElement
{
public:
    explicit XmlElement(const String& tag) : tagName(tag) {}
    bool hasTagName(const String& tag) const { return tagName == tag; }
    String tagName;
    std::map<std::string, float> attributes;  // param id -> natural value
};

class ValueTree
{
public:
    ValueTree() = default;
    explicit ValueTree(const String& type) : typeName(type) {}
    String getType() const { return typeName; }
    XmlElement* createXml() const
    {
        auto* x = new XmlElement(typeName);
        x->attributes = values;
        return x;
    }
    static ValueTree fromXml(const XmlElement& xml)
    {
        ValueTree t(xml.tagName);
        t.values = xml.attributes;
        return t;
    }
    String typeName;
    std::map<std::string, float> values;
};

// ----- AudioBuffer (refer-to-external + owned; getRMSLevel matches
//       juce_AudioSampleBuffer.h: float products, double accumulator) -----
template <typename T>
class AudioBuffer
{
public:
    AudioBuffer() = default;
    AudioBuffer(T* const* dataToReferTo, int nch, int ns)
        : numChannels(nch), numSamples(ns)
    {
        chanPtrs.assign(dataToReferTo, dataToReferTo + nch);
    }
    AudioBuffer(int nch, int ns) : numChannels(nch), numSamples(ns)
    {
        storage.assign(static_cast<size_t>(nch),
                       std::vector<T>(static_cast<size_t>(ns), T()));
        for (auto& v : storage) chanPtrs.push_back(v.data());
    }
    int getNumChannels() const { return numChannels; }
    int getNumSamples() const { return numSamples; }
    T* getWritePointer(int ch) { return chanPtrs[static_cast<size_t>(ch)]; }
    const T* getReadPointer(int ch) const { return chanPtrs[static_cast<size_t>(ch)]; }
    T getSample(int ch, int i) const { return chanPtrs[static_cast<size_t>(ch)][i]; }
    void clear(int ch, int start, int n)
    {
        std::memset(chanPtrs[static_cast<size_t>(ch)] + start, 0,
                    static_cast<size_t>(n) * sizeof(T));
    }
    void clear()
    {
        for (int ch = 0; ch < numChannels; ++ch)
            clear(ch, 0, numSamples);
    }
    void setSize(int nch, int ns)  // owned-storage resize (zeroed)
    {
        numChannels = nch;
        numSamples = ns;
        storage.assign(static_cast<size_t>(nch),
                       std::vector<T>(static_cast<size_t>(ns), T()));
        chanPtrs.clear();
        for (auto& v : storage) chanPtrs.push_back(v.data());
    }
    void applyGain(T gain)
    {
        for (int ch = 0; ch < numChannels; ++ch)
            for (int i = 0; i < numSamples; ++i)
                chanPtrs[static_cast<size_t>(ch)][i] *= gain;
    }
    T getRMSLevel(int channel, int startSample, int n) const
    {
        if (n <= 0 || channel < 0 || channel >= numChannels)
            return T(0);
        auto* data = chanPtrs[static_cast<size_t>(channel)] + startSample;
        double sum = 0.0;
        for (int i = 0; i < n; ++i)
        {
            auto sample = data[i];
            sum += sample * sample;  // T*T rounded to T, accumulated in double
        }
        return static_cast<T>(std::sqrt(sum / n));
    }
private:
    int numChannels = 0, numSamples = 0;
    std::vector<T*> chanPtrs;
    std::vector<std::vector<T>> storage;
};

struct MidiBuffer {};

// ----- AudioChannelSet / bus plumbing -----
class AudioChannelSet
{
public:
    static AudioChannelSet mono() { return AudioChannelSet(1); }
    static AudioChannelSet stereo() { return AudioChannelSet(2); }
    bool operator==(const AudioChannelSet& o) const { return n == o.n; }
    bool operator!=(const AudioChannelSet& o) const { return n != o.n; }
    int size() const { return n; }
private:
    explicit AudioChannelSet(int count) : n(count) {}
    int n = 2;
};

// ----- NormalisableRange (skew==1 path of juce_NormalisableRange.h) -----
template <typename T>
class NormalisableRange
{
public:
    NormalisableRange() = default;
    NormalisableRange(T rangeStart, T rangeEnd, T stepSize = T())
        : start(rangeStart), end(rangeEnd), interval(stepSize) {}
    T convertTo0to1(T v) const
    {
        auto proportion = clampTo0To1((v - start) / (end - start));
        return proportion;
    }
    T convertFrom0to1(T proportion) const
    {
        proportion = clampTo0To1(proportion);
        return start + (end - start) * proportion;
    }
    T start = T(0), end = T(1), interval = T(0), skew = T(1);
private:
    static T clampTo0To1(T v) { return jlimit(T(0), T(1), v); }
};

// ----- Parameters -----
class RangedAudioParameter
{
public:
    RangedAudioParameter(const String& id, const String& nm,
                         NormalisableRange<float> r, float defaultValue)
        : paramID(id), name(nm), range(r), value(defaultValue),
          defaultVal(defaultValue) {}
    virtual ~RangedAudioParameter() = default;
    const NormalisableRange<float>& getNormalisableRange() const { return range; }
    void setValueNotifyingHost(float normalised)
    {
        value.store(range.convertFrom0to1(normalised), std::memory_order_relaxed);
    }
    float getValue() const
    {
        return range.convertTo0to1(value.load(std::memory_order_relaxed));
    }
    String paramID, name;
    NormalisableRange<float> range;
    std::atomic<float> value;  // natural (denormalised) value, like APVTS raw
    float defaultVal;
};

class AudioParameterFloat : public RangedAudioParameter
{
public:
    AudioParameterFloat(const String& id, const String& nm, float minValue,
                        float maxValue, float defaultValue)
        : RangedAudioParameter(id, nm, NormalisableRange<float>(minValue, maxValue),
                               defaultValue) {}
};

class AudioParameterChoice : public RangedAudioParameter
{
public:
    AudioParameterChoice(const String& id, const String& nm,
                         const StringArray& choicesIn, int defaultIndex)
        : RangedAudioParameter(
              id, nm,
              NormalisableRange<float>(0.0f,
                                       static_cast<float>(choicesIn.size() - 1), 1.0f),
              static_cast<float>(defaultIndex)),
          choices(choicesIn) {}
    StringArray choices;
};

class AudioParameterBool : public RangedAudioParameter
{
public:
    AudioParameterBool(const String& id, const String& nm, bool defaultValue)
        : RangedAudioParameter(id, nm, NormalisableRange<float>(0.0f, 1.0f, 1.0f),
                               defaultValue ? 1.0f : 0.0f) {}
};

class UndoManager;
class AudioProcessorValueTreeState;
class AudioProcessorEditor;

// ----- AudioProcessor -----
class AudioProcessor
{
public:
    struct BusesProperties
    {
        BusesProperties withInput(const String&, const AudioChannelSet& set, bool) const
        {
            BusesProperties b = *this; b.inputs = set.size(); return b;
        }
        BusesProperties withOutput(const String&, const AudioChannelSet& set, bool) const
        {
            BusesProperties b = *this; b.outputs = set.size(); return b;
        }
        int inputs = 2, outputs = 2;
    };
    struct BusesLayout
    {
        AudioChannelSet in = AudioChannelSet::stereo();
        AudioChannelSet out = AudioChannelSet::stereo();
        const AudioChannelSet& getMainInputChannelSet() const { return in; }
        const AudioChannelSet& getMainOutputChannelSet() const { return out; }
    };

    explicit AudioProcessor(const BusesProperties& props)
        : numIn(props.inputs), numOut(props.outputs) {}
    virtual ~AudioProcessor() = default;

    virtual void prepareToPlay(double sampleRate, int samplesPerBlock) = 0;
    virtual void releaseResources() = 0;
    virtual bool isBusesLayoutSupported(const BusesLayout&) const { return true; }
    virtual void processBlock(AudioBuffer<float>&, MidiBuffer&) = 0;
    virtual AudioProcessorEditor* createEditor() = 0;
    virtual bool hasEditor() const = 0;
    virtual const String getName() const = 0;
    virtual bool acceptsMidi() const = 0;
    virtual bool producesMidi() const = 0;
    virtual bool isMidiEffect() const = 0;
    virtual double getTailLengthSeconds() const = 0;
    virtual int getNumPrograms() = 0;
    virtual int getCurrentProgram() = 0;
    virtual void setCurrentProgram(int) = 0;
    virtual const String getProgramName(int) = 0;
    virtual void changeProgramName(int, const String&) = 0;
    virtual void getStateInformation(MemoryBlock&) = 0;
    virtual void setStateInformation(const void*, int) = 0;

    int getTotalNumInputChannels() const { return numIn; }
    int getTotalNumOutputChannels() const { return numOut; }
    double getSampleRate() const { return sampleRate_; }
    void setPlayConfigDetails(int newIn, int newOut, double sr, int block)
    {
        numIn = newIn; numOut = newOut; sampleRate_ = sr; blockSize_ = block;
    }

    void copyXmlToBinary(const XmlElement& xml, MemoryBlock& dest)
    {
        std::ostringstream os;
        os << xml.tagName.std_str() << '\n';
        for (auto& kv : xml.attributes)
            os << kv.first << '=' << kv.second << '\n';
        auto s = os.str();
        dest.append(s.data(), s.size());
    }
    XmlElement* getXmlFromBinary(const void* data, int sizeInBytes)
    {
        std::istringstream is(
            std::string(static_cast<const char*>(data), static_cast<size_t>(sizeInBytes)));
        std::string tag;
        if (!std::getline(is, tag)) return nullptr;
        auto* x = new XmlElement(String(tag));
        std::string line;
        while (std::getline(is, line))
        {
            auto eq = line.find('=');
            if (eq != std::string::npos)
                x->attributes[line.substr(0, eq)] = std::stof(line.substr(eq + 1));
        }
        return x;
    }

    // Stub-internal hook so the oracle harness can reach the (private) APVTS
    // of any processor through the base class. Set by the APVTS constructor.
    AudioProcessorValueTreeState* oracleApvts = nullptr;

private:
    int numIn = 2, numOut = 2;
    double sampleRate_ = 44100.0;
    int blockSize_ = 512;
};

// ----- AudioProcessorValueTreeState -----
class AudioProcessorValueTreeState
{
public:
    struct ParameterLayout
    {
        template <typename Iterator>
        ParameterLayout(Iterator b, Iterator e)
        {
            for (auto it = b; it != e; ++it)
                params.push_back(std::move(*it));
        }
        std::vector<std::unique_ptr<RangedAudioParameter>> params;
    };
    class SliderAttachment;  // declaration only (editor stub)

    AudioProcessorValueTreeState(AudioProcessor& processor, UndoManager*,
                                 const String& valueTreeType, ParameterLayout layout)
        : state(valueTreeType)
    {
        processor.oracleApvts = this;
        for (auto& p : layout.params)
        {
            byId[p->paramID.std_str()] = p.get();
            owned.push_back(std::move(p));
        }
    }
    RangedAudioParameter* getParameter(const String& id) const
    {
        auto it = byId.find(id.std_str());
        return it == byId.end() ? nullptr : it->second;
    }
    std::atomic<float>* getRawParameterValue(const String& id) const
    {
        auto* p = getParameter(id);
        return p == nullptr ? nullptr : &p->value;
    }
    ValueTree copyState() const
    {
        ValueTree t(state.getType());
        for (auto& kv : byId)
            t.values[kv.first] = kv.second->value.load(std::memory_order_relaxed);
        return t;
    }
    void replaceState(const ValueTree& t)
    {
        for (auto& kv : t.values)
        {
            auto it = byId.find(kv.first);
            if (it != byId.end())
                it->second->value.store(kv.second, std::memory_order_relaxed);
        }
    }
    ValueTree state;
private:
    std::map<std::string, RangedAudioParameter*> byId;
    std::vector<std::unique_ptr<RangedAudioParameter>> owned;
};

// ----- GUI shells (declaration-only; never instantiated by the oracle) -----
class Colour
{
public:
    Colour() = default;
    explicit Colour(uint32_t argb) : value(argb) {}
    uint32_t value = 0xff000000;
};
template <typename T> struct Rectangle { T x{}, y{}, w{}, h{}; };
class Graphics;
class Component
{
public:
    virtual ~Component() = default;
    virtual void paint(Graphics&) {}
    virtual void resized() {}
};
class AudioProcessorEditor : public Component
{
public:
    explicit AudioProcessorEditor(AudioProcessor& p) : processor(p) {}
    AudioProcessor& processor;
};
class Timer
{
public:
    virtual ~Timer() = default;
    virtual void timerCallback() = 0;
    void startTimerHz(int) {}
    void stopTimer() {}
};
class Slider;
class Label
{
public:
    Label() = default;
};

}  // namespace juce
