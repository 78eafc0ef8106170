// C API over the compiled reference plugins (ground-truth oracle for the
// null tests).  The reference sources are compiled verbatim from
// /root/reference/src via the tu_*.cpp wrappers; this harness only drives
// them through their public JUCE-shaped interface.
//
// Exposed per processor: create/prepare/set-param/process/metrics/programs/
// state save-load.  Plus a standalone JuicinessAnalyzer harness.
#define JucePlugin_Name "JuicyOracle"

#include "/root/reference/src/plugins/JuicyPunch/PluginProcessor.h"
#include "/root/reference/src/plugins/JuicySaturator/PluginProcessor.h"
#include "/root/reference/src/plugins/JuicyWidth/PluginProcessor.h"
#include "/root/reference/src/plugins/JuicyTexture/PluginProcessor.h"
#include "/root/reference/src/plugins/JuicyMotion/PluginProcessor.h"
#include "/root/reference/src/plugins/JuicyInfer/PluginProcessor.h"
#include "/root/reference/src/plugins/JuicyCohere/PluginProcessor.h"

#include <functional>
#include <memory>
#include <string>

namespace
{
struct OracleHandle
{
    std::unique_ptr<juce::AudioProcessor> proc;
    std::function<JuicinessMetrics()> metrics;
};

template <typename P>
OracleHandle* makeHandle()
{
    auto* h = new OracleHandle;
    auto* p = new P();
    h->proc.reset(p);
    h->metrics = [p]() { return p->getLatestMetrics(); };
    return h;
}

void metricsToArray(const JuicinessMetrics& m, float* out13)
{
    out13[0] = m.score;
    out13[1] = m.preScore;
    out13[2] = m.postScore;
    out13[3] = m.emphasis;
    out13[4] = m.coherence;
    out13[5] = m.synesthesia;
    out13[6] = m.fatigueRisk;
    out13[7] = m.repetitionDensity;
    out13[8] = m.punch;
    out13[9] = m.richness;
    out13[10] = m.clarity;
    out13[11] = m.width;
    out13[12] = m.monoSafety;
}
}  // namespace

extern "C"
{
void* oracle_create(const char* name)
{
    std::string n(name);
    if (n == "punch") return makeHandle<JuicyPunchAudioProcessor>();
    if (n == "saturator") return makeHandle<JuicySaturatorAudioProcessor>();
    if (n == "width") return makeHandle<JuicyWidthAudioProcessor>();
    if (n == "texture") return makeHandle<JuicyTextureAudioProcessor>();
    if (n == "motion") return makeHandle<JuicyMotionAudioProcessor>();
    if (n == "infer") return makeHandle<JuicyInferAudioProcessor>();
    if (n == "cohere") return makeHandle<JuicyCohereAudioProcessor>();
    return nullptr;
}

void oracle_prepare(void* vh, double sampleRate, int blockSize, int numChannels)
{
    auto* h = static_cast<OracleHandle*>(vh);
    h->proc->setPlayConfigDetails(numChannels, numChannels, sampleRate, blockSize);
    h->proc->prepareToPlay(sampleRate, blockSize);
}

int oracle_set_param(void* vh, const char* id, float naturalValue)
{
    auto* h = static_cast<OracleHandle*>(vh);
    auto* a = h->proc->oracleApvts->getRawParameterValue(id);
    if (a == nullptr) return -1;
    a->store(naturalValue, std::memory_order_relaxed);
    return 0;
}

float oracle_get_param(void* vh, const char* id)
{
    auto* h = static_cast<OracleHandle*>(vh);
    auto* a = h->proc->oracleApvts->getRawParameterValue(id);
    return a == nullptr ? -1.0e30f : a->load(std::memory_order_relaxed);
}

// Sets via the normalized path (NormalisableRange round-trip), as a DAW would.
int oracle_set_param_notifying(void* vh, const char* id, float naturalValue)
{
    auto* h = static_cast<OracleHandle*>(vh);
    auto* p = h->proc->oracleApvts->getParameter(id);
    if (p == nullptr) return -1;
    p->setValueNotifyingHost(p->getNormalisableRange().convertTo0to1(naturalValue));
    return 0;
}

void oracle_process(void* vh, float** channelData, int numChannels, int numSamples)
{
    auto* h = static_cast<OracleHandle*>(vh);
    juce::AudioBuffer<float> buffer(channelData, numChannels, numSamples);
    juce::MidiBuffer midi;
    h->proc->processBlock(buffer, midi);
}

void oracle_metrics(void* vh, float* out13)
{
    auto* h = static_cast<OracleHandle*>(vh);
    metricsToArray(h->metrics(), out13);
}

int oracle_num_programs(void* vh)
{
    return static_cast<OracleHandle*>(vh)->proc->getNumPrograms();
}
int oracle_get_program(void* vh)
{
    return static_cast<OracleHandle*>(vh)->proc->getCurrentProgram();
}
void oracle_set_program(void* vh, int index)
{
    static_cast<OracleHandle*>(vh)->proc->setCurrentProgram(index);
}
int oracle_program_name(void* vh, int index, char* out, int cap)
{
    auto name = static_cast<OracleHandle*>(vh)->proc->getProgramName(index);
    int n = static_cast<int>(strlen(name.toRawUTF8()));
    if (n >= cap) n = cap - 1;
    memcpy(out, name.toRawUTF8(), static_cast<size_t>(n));
    out[n] = 0;
    return n;
}

int oracle_state_save(void* vh, char* out, int cap)
{
    juce::MemoryBlock mb;
    static_cast<OracleHandle*>(vh)->proc->getStateInformation(mb);
    int n = static_cast<int>(mb.getSize());
    if (n > cap) return -n;
    memcpy(out, mb.getData(), static_cast<size_t>(n));
    return n;
}
void oracle_state_load(void* vh, const void* data, int size)
{
    static_cast<OracleHandle*>(vh)->proc->setStateInformation(data, size);
}

void oracle_destroy(void* vh) { delete static_cast<OracleHandle*>(vh); }

// ---- standalone analyzer ----
void* analyzer_create(double sampleRate, int blockSize, int numChannels)
{
    auto* a = new JuicinessAnalyzer();
    a->prepare(sampleRate, blockSize, numChannels);
    return a;
}
void analyzer_reset(void* va) { static_cast<JuicinessAnalyzer*>(va)->reset(); }
void analyzer_analyze(void* va, float** channelData, int numChannels,
                      int numSamples, float* out13)
{
    juce::AudioBuffer<float> buffer(channelData, numChannels, numSamples);
    metricsToArray(static_cast<JuicinessAnalyzer*>(va)->analyze(buffer), out13);
}
void analyzer_destroy(void* va) { delete static_cast<JuicinessAnalyzer*>(va); }
}
